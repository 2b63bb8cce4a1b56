#!/usr/bin/env python
"""Entry point shim (reference: eval_wheatgs.py)."""
from wheat3dgs_tpu.apps.eval_wheatgs_app import main

if __name__ == "__main__":
    main()
