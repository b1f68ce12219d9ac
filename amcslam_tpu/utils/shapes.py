"""Shared shape-bucketing policy.

Every host→device boundary pads dynamic problem sizes up to a power-of-two
(or power-of-``factor``) bucket so that jitted programs compile once per
bucket instead of once per frame (see README "Known limits": executable
accumulation on the CPU backend, retrace latency everywhere). Keeping the
policy in one place means a change (e.g. coarser factor, higher floor)
applies to every call site at once.
"""


def bucket_pow2(n: int, minimum: int = 16, factor: int = 2) -> int:
    """Smallest ``minimum * factor**k >= n`` (returns ``minimum`` for n<=it)."""
    b = minimum
    while b < n:
        b *= factor
    return b
