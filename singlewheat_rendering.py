#!/usr/bin/env python
"""Viewer without instance overlay (reference:
wheat3dgsviewer/singlewheat_rendering.py)."""

import sys

from wheatgs_rendering import build_viewer
from wheat3dgs_tpu.viewer import serve

if __name__ == "__main__":
    vs, args = build_viewer(sys.argv[1:], with_overlay=False)
    serve(vs, port=args.port)
