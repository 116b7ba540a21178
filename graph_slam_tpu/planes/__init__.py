from . import oriented_plane

__all__ = ["oriented_plane"]
