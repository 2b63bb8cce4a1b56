#!/usr/bin/env python
"""Entry point shim (reference: render.py)."""
from wheat3dgs_tpu.apps.render_sets import main

if __name__ == "__main__":
    main()
