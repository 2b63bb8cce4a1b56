#!/usr/bin/env python
"""Entry point shim (reference: metrics.py)."""
from wheat3dgs_tpu.apps.metrics_app import main

if __name__ == "__main__":
    main()
