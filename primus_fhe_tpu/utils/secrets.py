"""Secret-material hygiene helpers.

The reference zeroizes secret-capable integers on drop (``zeroize`` bound
on ``Integer``, crates/primus_integer/src/integer.rs:88).  JAX arrays are
immutable and garbage-collected, so the equivalent control is explicit
buffer deletion: :func:`delete` frees the device buffer immediately
(subsequent use raises), which is the strongest lifetime guarantee the
runtime offers.  True memory scrubbing is not exposed by XLA; deployments
with stricter requirements should keep secrets host-side in NumPy arrays
and use :func:`scrub_host`.
"""

from __future__ import annotations

import numpy as np


def delete(*arrays) -> None:
    """Immediately frees device buffers holding secret material."""
    for a in arrays:
        try:
            a.delete()
        except AttributeError:
            pass


def scrub_host(*arrays) -> None:
    """Overwrites host NumPy buffers with zeros in place."""
    for a in arrays:
        if isinstance(a, np.ndarray) and a.flags.writeable:
            a.fill(0)
