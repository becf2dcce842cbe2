"""Keras .h5 pretrained-weight import shim tests (synthesizes a Keras-layout
h5 file with h5py; no TF/voxelmorph needed)."""

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from multimodal_registration_tpu.models.h5_import import import_keras_vxm_h5
from multimodal_registration_tpu.models.vxm_dense import VxmConfig, params_template

CFG = VxmConfig(enc=(4, 4, 4, 4), dec=(4, 4, 4, 4, 4, 4))


def _conv_shapes(cfg):
    """(in_ch, out_ch) per conv in model order, mirroring the U-Net wiring."""
    shapes = []
    in_ch = 2
    enc_out = []
    for f in cfg.enc:
        shapes.append((in_ch, f))
        enc_out.append(f)
        in_ch = f
    n_lev = len(cfg.enc)
    for i, f in enumerate(cfg.dec[:n_lev]):
        shapes.append((in_ch, f))
        in_ch = f
        if i < n_lev - 1:  # upsample + skip concat
            in_ch = f + enc_out[-(i + 1)]
    for f in cfg.dec[n_lev:]:
        shapes.append((in_ch, f))
        in_ch = f
    shapes.append((in_ch, 3))  # flow head
    return shapes


def _write_keras_h5(path, cfg, seed=0):
    rng = np.random.default_rng(seed)
    kernels = []
    with h5py.File(path, "w") as f:
        mw = f.create_group("model_weights")
        layer_names = []
        for li, (cin, cout) in enumerate(_conv_shapes(cfg)):
            lname = f"vxm_dense_conv_{li}"
            layer_names.append(lname)
            g = mw.create_group(lname)
            k = rng.normal(size=(3, 3, 3, cin, cout)).astype(np.float32)
            b = rng.normal(size=(cout,)).astype(np.float32)
            kernels.append((k, b))
            g.create_dataset(f"{lname}/kernel:0", data=k)
            g.create_dataset(f"{lname}/bias:0", data=b)
            g.attrs["weight_names"] = [
                f"{lname}/kernel:0".encode(), f"{lname}/bias:0".encode()
            ]
        mw.attrs["layer_names"] = [n.encode() for n in layer_names]
    return kernels


def test_import_roundtrip(tmp_path):
    p = str(tmp_path / "model.h5")
    kernels = _write_keras_h5(p, CFG)
    template = params_template(CFG)
    params = import_keras_vxm_h5(p, template, CFG)
    pp = params["params"]
    np.testing.assert_array_equal(pp["unet"]["enc_0"]["conv"]["kernel"], kernels[0][0])
    np.testing.assert_array_equal(pp["unet"]["dec_3"]["conv"]["kernel"], kernels[7][0])
    np.testing.assert_array_equal(pp["unet"]["final_1"]["conv"]["kernel"], kernels[9][0])
    np.testing.assert_array_equal(pp["flow"]["kernel"], kernels[10][0])
    np.testing.assert_array_equal(pp["flow"]["bias"], kernels[10][1])


def test_import_wrong_layer_count(tmp_path):
    p = str(tmp_path / "bad.h5")
    _write_keras_h5(p, VxmConfig(enc=(4, 4), dec=(4, 4, 4)))
    template = params_template(CFG)
    with pytest.raises(ValueError, match="Conv3D layers"):
        import_keras_vxm_h5(p, template, CFG)


def test_imported_params_apply(tmp_path):
    """Imported weights must run through the model (shape correctness)."""
    import jax.numpy as jnp

    from multimodal_registration_tpu.models.vxm_dense import VxmDense

    cfg = VxmConfig(enc=CFG.enc, dec=CFG.dec, compute_dtype="float32")
    p = str(tmp_path / "model.h5")
    _write_keras_h5(p, cfg)
    params = import_keras_vxm_h5(p, params_template(cfg), cfg)
    out = VxmDense(cfg=cfg).apply(
        params, jnp.zeros((1, 16, 16, 16, 1)), jnp.zeros((1, 16, 16, 16, 1))
    )
    assert out["moved"].shape == (1, 16, 16, 16, 1)


def test_export_import_roundtrip(tmp_path):
    """h5 export → import must reproduce the exact params."""
    import numpy as np

    from multimodal_registration_tpu.models.h5_export import export_keras_vxm_h5

    rng = np.random.default_rng(7)
    template = params_template(CFG)
    params = jax_tree = __import__("jax").tree_util.tree_map(
        lambda x: np.asarray(rng.normal(size=x.shape), np.float32), template
    )
    p = str(tmp_path / "export.h5")
    export_keras_vxm_h5(params, CFG, p)
    back = import_keras_vxm_h5(p, template, CFG)
    flat_a = __import__("jax").tree_util.tree_leaves(params)
    flat_b = __import__("jax").tree_util.tree_leaves(back)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(a, b)
