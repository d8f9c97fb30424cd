"""ConvGRU (flax, NHWC) used by V2VNet/DiscoNet fusion.

Capability parity with reference
opv2v/opencood/models/sub_modules/convgru.py:7 (ConvGRUCell) /:73
(ConvGRU).  Parameter names mirror torch (`conv_gates`, `conv_can`,
`cell_list.<i>`)."""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from cobevt_tpu.nn.layers import torch_conv


class ConvGRUCell(nn.Module):
    hidden_dim: int
    kernel_size: Tuple[int, int] = (3, 3)
    bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, h):
        """x: (B, H, W, C_in); h: (B, H, W, hidden). Returns next h."""
        pad = (self.kernel_size[0] // 2, self.kernel_size[1] // 2)
        combined = jnp.concatenate([x, h], axis=-1)
        gates = torch_conv(2 * self.hidden_dim, self.kernel_size, 1, pad,
                           self.bias, self.dtype, "conv_gates")(combined)
        gamma, beta = jnp.split(gates, 2, axis=-1)
        reset = jax.nn.sigmoid(gamma)
        update = jax.nn.sigmoid(beta)
        cand_in = jnp.concatenate([x, reset * h], axis=-1)
        cand = jnp.tanh(torch_conv(self.hidden_dim, self.kernel_size, 1,
                                   pad, self.bias, self.dtype,
                                   "conv_can")(cand_in))
        return (1 - update) * h + update * cand


class ConvGRU(nn.Module):
    """Stacked cells; a single timestep with zero-initialized hidden state
    reproduces how the fusion modules invoke the reference ConvGRU."""

    hidden_dims: Sequence[int] = (64,)
    kernel_size: Tuple[int, int] = (3, 3)
    bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, C).  Returns the last layer's hidden state after
        one step from zero hidden."""
        h = x
        for i, hd in enumerate(self.hidden_dims):
            cell = ConvGRUCell(hd, self.kernel_size, self.bias,
                               dtype=self.dtype, name=f"cell_list_{i}")
            zero = jnp.zeros((*h.shape[:-1], hd), h.dtype)
            h = cell(h, zero)
        return h
