from .pipeline import RasterConfig, RenderOut, render, render_jit  # noqa: F401
