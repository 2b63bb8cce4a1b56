#!/usr/bin/env python
"""Entry point shim (reference: run_3d_seg.py)."""
from wheat3dgs_tpu.apps.run_3d_seg_app import main

if __name__ == "__main__":
    main()
