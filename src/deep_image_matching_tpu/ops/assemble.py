"""Device-side padded batch assembly for prefetched images.

The batched extract programs take a zero-padded ``(B, ph, pw, C)`` batch.
When images arrive as HOST arrays the runner assembles that batch on host
and uploads it in one transfer; when images were decode-prefetched and
uploaded individually (``utils/prefetch.py``, one uint8 transfer per image
overlapped with decode), the batch is assembled ON DEVICE instead — pad +
stack are trivial XLA ops, and the pixels never make a second trip over
the link. Reference analog: per-image read + preprocess inline with the
model call (``extractor_base.py:190-196``); there is no reference analog
for the overlap because CUDA hosts decode fast and transfer faster.
"""

from __future__ import annotations

from typing import Sequence, Tuple


def assemble_batch(dev_imgs: Sequence, pad_hw: Tuple[int, int], channels: int | None = None):
    """Stack device-resident images of varying (h, w) into one zero-padded
    ``(B, ph, pw, C)`` device batch, preserving dtype (uint8 stays uint8 —
    the extract programs normalize on device).

    ``channels``: force the channel count (grayscale -> RGB by broadcast).
    """
    import jax.numpy as jnp

    ph, pw = pad_hw
    padded = []
    for x in dev_imgs:
        x = jnp.asarray(x)
        if x.ndim == 2:
            x = x[..., None]
        if channels is not None and x.shape[-1] != channels:
            if x.shape[-1] == 1:
                x = jnp.broadcast_to(x, x.shape[:2] + (channels,))
            else:
                raise ValueError(
                    f"cannot adapt {x.shape[-1]} channels to {channels}"
                )
        h, w = x.shape[:2]
        padded.append(jnp.pad(x, ((0, ph - h), (0, pw - w), (0, 0))))
    return jnp.stack(padded)


def is_device_array(x) -> bool:
    """True for jax arrays (vs host numpy) without importing jax eagerly."""
    import numpy as np

    return not isinstance(x, np.ndarray) and hasattr(x, "device")
