from .plots import (coeftab, contour, density, hdpi, line, mean, precis,
                    scatter, shade, show, standardize, stddev, whiskers)

__all__ = ["coeftab", "contour", "density", "hdpi", "line", "mean",
           "precis", "scatter", "shade", "show", "standardize", "stddev",
           "whiskers"]
