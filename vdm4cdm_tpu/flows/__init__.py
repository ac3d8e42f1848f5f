from .sfm import SFM

__all__ = ["SFM"]
