"""3-D U-Net backbone in Flax, mirroring the VoxelMorph U-Net topology.

Parity target: the ``Unet`` inside ``vxm.networks.VxmDense`` as configured by
``nb_unet_features=(enc, dec)`` (`train_synthmorph.py:276`,
`config/config.json:44-45`):

  * encoder: one 3³ conv + LeakyReLU(0.2) per level, 2× max-pool between
    levels (``len(enc)`` levels);
  * decoder: one 3³ conv + LeakyReLU per level; after each of the first
    ``len(enc) - nb_upsample_skips`` decoder levels, 2× nearest upsampling and
    skip concatenation (``[upsampled, skip]`` order, matching Keras);
  * remaining ``dec[len(enc):]`` entries are extra convs at the final
    resolution.

With ``nb_upsample_skips = log2(svf_res)`` the output feature map sits at
``1/svf_res`` resolution — this is how ``svf_res=2`` halves the SVF grid
(`config/README.md:54`).

TPU notes: channels-last NDHWC layout (native for XLA TPU convs), bfloat16
compute with float32 parameters by default. 3³ convs map onto the MXU as
implicit GEMMs; XLA fuses the LeakyReLU.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp


class ConvBlock(nn.Module):
    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features,
            kernel_size=(3, 3, 3),
            padding="SAME",
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)
        return nn.leaky_relu(x, negative_slope=0.2)


def _upsample_nearest_2x(x):
    # (B, X, Y, Z, C) -> (B, 2X, 2Y, 2Z, C); Keras UpSampling3D parity
    for axis in (1, 2, 3):
        x = jnp.repeat(x, 2, axis=axis)
    return x


class Unet(nn.Module):
    enc_nf: Sequence[int]
    dec_nf: Sequence[int]
    nb_upsample_skips: int = 0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        nb_levels = len(self.enc_nf) + 1
        skips = [x]
        for i, f in enumerate(self.enc_nf):
            x = ConvBlock(f, dtype=self.dtype, name=f"enc_{i}")(x)
            skips.append(x)
            x = nn.max_pool(x, window_shape=(2, 2, 2), strides=(2, 2, 2))

        # decoder: skips are popped deepest-first (enc_{N-1} … enc_0); the raw
        # input stays unused, matching the vxm Unet's encoder history
        for i, f in enumerate(self.dec_nf[: nb_levels - 1]):
            x = ConvBlock(f, dtype=self.dtype, name=f"dec_{i}")(x)
            if i < (nb_levels - 1 - self.nb_upsample_skips):
                x = _upsample_nearest_2x(x)
                x = jnp.concatenate([x, skips.pop()], axis=-1)

        for j, f in enumerate(self.dec_nf[nb_levels - 1 :]):
            x = ConvBlock(f, dtype=self.dtype, name=f"final_{j}")(x)
        return x
