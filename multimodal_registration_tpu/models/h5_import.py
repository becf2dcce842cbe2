"""Import published Keras VoxelMorph ``.h5`` weights into our Flax VxmDense.

The reference loads pretrained models with ``vxm.networks.VxmDense.load(path)``
(`bids_registration.py:439`) and transfers weights into a model built at a
different inshape via ``get_weights``/``set_weights``
(`bids_registration.py:311-312`) — possible because the network is pure conv.

We exploit the same property: a Keras VxmDense h5 contains exactly the ordered
3-D conv kernels of the U-Net (encoder, decoder, final convs) followed by the
flow head. We walk ``model_weights`` in ``layer_names`` order, collect
``(kernel, bias)`` pairs for every Conv3D layer, and map them positionally
onto our module order (``unet/enc_i``, ``unet/dec_i``, ``unet/final_j``,
``flow``), validating shapes.
"""

from __future__ import annotations

import numpy as np

from multimodal_registration_tpu.models.vxm_dense import VxmConfig


def _collect_conv_weights(h5path: str):
    import h5py

    pairs = []
    with h5py.File(h5path, "r") as f:
        grp = f["model_weights"] if "model_weights" in f else f
        layer_names = [
            n.decode() if isinstance(n, bytes) else n
            for n in grp.attrs.get("layer_names", list(grp.keys()))
        ]
        for lname in layer_names:
            if lname not in grp:
                continue
            sub = grp[lname]
            weight_names = [
                n.decode() if isinstance(n, bytes) else n
                for n in sub.attrs.get("weight_names", [])
            ]
            kernel, bias = None, None
            for wn in weight_names:
                arr = np.asarray(sub[wn])
                if arr.ndim == 5 and wn.endswith(("kernel:0", "kernel")):
                    kernel = arr
                elif arr.ndim == 1 and wn.endswith(("bias:0", "bias")):
                    bias = arr
            if kernel is not None:
                pairs.append((lname, kernel, bias))
    return pairs


def conv_module_order(cfg: VxmConfig):
    """Our U-Net module names in Keras layer order (flow head appended by
    callers). Shared by the importer and :mod:`h5_export` — the two MUST
    agree or weights land on the wrong layers."""
    return (
        [f"enc_{i}" for i in range(len(cfg.enc))]
        + [f"dec_{i}" for i in range(len(cfg.enc))]
        + [f"final_{j}" for j in range(len(cfg.dec) - len(cfg.enc))]
    )


def import_keras_vxm_h5(h5path: str, params_template, cfg: VxmConfig):
    """Return a params pytree with conv kernels/biases replaced by the h5 ones."""
    pairs = _collect_conv_weights(h5path)
    order = conv_module_order(cfg)
    n_expected = len(order) + 1  # + flow head
    if len(pairs) != n_expected:
        raise ValueError(
            f"h5 file has {len(pairs)} Conv3D layers, expected {n_expected} for "
            f"enc={cfg.enc} dec={cfg.dec}; layers found: {[p[0] for p in pairs]}"
        )

    params = jax_tree_copy(params_template)
    p = params["params"]
    for name, (lname, kernel, bias) in zip(order, pairs[:-1]):
        tgt = p["unet"][name]["conv"]
        _assign(tgt, kernel, bias, f"{lname} -> unet/{name}")
    _assign(p["flow"], pairs[-1][1], pairs[-1][2], f"{pairs[-1][0]} -> flow")
    return params


def _assign(tgt: dict, kernel: np.ndarray, bias, label: str):
    if tuple(tgt["kernel"].shape) != tuple(kernel.shape):
        raise ValueError(
            f"kernel shape mismatch importing {label}: "
            f"{kernel.shape} vs {tuple(tgt['kernel'].shape)}"
        )
    tgt["kernel"] = np.asarray(kernel, np.float32)
    if bias is not None:
        tgt["bias"] = np.asarray(bias, np.float32)


def jax_tree_copy(tree):
    import jax

    return jax.tree_util.tree_map(lambda x: np.array(x), tree)
