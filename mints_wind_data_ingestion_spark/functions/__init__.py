from . import text, time, wind

__all__ = ["time", "wind", "text"]
