"""Shared batch-tile selection for the gridded Pallas kernels.

Every batched kernel (streaming_cache.fused_cached_batch,
pallas_encoder.encoder_layer_train, fused_forward.fused_recompute_batch)
tiles the stream/batch axis and must fall back to the largest divisor when
the batch is not a multiple of the preferred tile — with a warning when the
fallback degenerates (a prime batch size degrades to tile 1, one grid step
per element)."""

import warnings


def pick_tile(n: int, preferred: int, context: str = "pallas tile") -> int:
    """Largest divisor of ``n`` that is <= ``preferred``."""
    preferred = min(preferred, n)
    bt = preferred
    while n % bt:
        bt -= 1
    if bt * 2 <= preferred:
        warnings.warn(
            f"{context}: batch {n} is not divisible by the preferred tile "
            f"{preferred}; falling back to tile {bt} ({n // bt} grid "
            f"steps). Pad the batch/pool to a multiple of {preferred} to "
            f"avoid this.", stacklevel=3)
    return bt
