"""Native (C++) host-side kernels: mesh decimation, isotropic remeshing,
isosurface extraction. Built lazily with g++ via ctypes (no pybind11 in this
image). See src/geometry.cpp for the reference-parity notes."""

from . import geometry

__all__ = ["geometry"]
