"""Numpy sequence padder (reference semantics).

Reference: ``fastie/models/named_entity_recognition/global_pointer/
decode_utils.py:24-48`` (``sequence_padding``) — pads a list of arrays
to a common shape along the first ``seq_dims`` dimensions, pre- or
post-padding with ``value``. Used by every collator in the reference
(SURVEY §2.2 M10); in our engine it lives inside scorer actors when a
dense tensor batch is formed.
"""

from __future__ import annotations

import numpy as np


def sequence_padding(inputs, length=None, value=0, seq_dims=1, mode="post"):
    if length is None:
        length = np.max([np.shape(x)[:seq_dims] for x in inputs], axis=0)
    elif not hasattr(length, "__getitem__"):
        length = [length]

    slices = [np.s_[: length[i]] for i in range(seq_dims)]
    slices = tuple(slices) if len(slices) > 1 else slices[0]
    pad_width = [(0, 0) for _ in np.shape(inputs[0])]

    outputs = []
    for x in inputs:
        x = x[slices]
        for i in range(seq_dims):
            if mode == "post":
                pad_width[i] = (0, length[i] - np.shape(x)[i])
            elif mode == "pre":
                pad_width[i] = (length[i] - np.shape(x)[i], 0)
            else:
                raise ValueError('"mode" argument must be "post" or "pre".')
        x = np.pad(x, pad_width, "constant", constant_values=value)
        outputs.append(x)

    return np.array(outputs)
