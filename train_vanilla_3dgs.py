#!/usr/bin/env python
"""Entry point shim (reference: train_vanilla_3dgs.py)."""
from wheat3dgs_tpu.apps.train_vanilla import main

if __name__ == "__main__":
    main()
