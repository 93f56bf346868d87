"""Pure-Python CPU oracle for the BIP-352 silent-payments scan pipeline.

This package is the ground truth every device kernel is tested against. It
plays the role the reference's ``scripts/*.py`` CPU oracles and gECC's python
models play (see /root/reference/scripts/compute_bip352_expected.py and
SURVEY.md §2.3), but is written from scratch as a first-class library.
"""

from .ec import (
    P, N, GX, GY, Point, INFINITY,
    ec_add, ec_double, ec_mul, ec_neg, is_on_curve, decompress_point,
)
from .pipeline import (
    TAG, tagged_hash, serialize_compressed, shared_secret_hash,
    scan_row, upper64_signed,
)
from .encoding import (
    point_to_blob64, blob64_to_point, scalar_to_blob32, blob32_to_scalar,
)

__all__ = [
    "P", "N", "GX", "GY", "Point", "INFINITY",
    "ec_add", "ec_double", "ec_mul", "ec_neg", "is_on_curve",
    "decompress_point",
    "TAG", "tagged_hash", "serialize_compressed", "shared_secret_hash",
    "scan_row", "upper64_signed",
    "point_to_blob64", "blob64_to_point", "scalar_to_blob32",
    "blob32_to_scalar",
]
