#!/usr/bin/env python
"""Entry point shim (reference: render_360.py)."""
from wheat3dgs_tpu.apps.render_360_app import main

if __name__ == "__main__":
    main()
