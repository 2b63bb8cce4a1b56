from .pipeline import RasterConfig, RenderOut, render  # noqa: F401
