from . import gpr, svgp

__all__ = ["gpr", "svgp"]
