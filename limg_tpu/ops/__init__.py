from . import layout, error, fit, factors, crush, dither, decode  # noqa: F401
