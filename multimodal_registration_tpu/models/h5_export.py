"""Export our Flax VxmDense params to a Keras-layout ``.h5`` file.

Inverse of :mod:`h5_import` — writes the ``model_weights/<layer>/<layer>/
kernel:0`` / ``bias:0`` structure with ``layer_names`` / ``weight_names``
attrs that ``keras.Model.load_weights`` (and our importer) walk. This is the
interchange path back toward the reference stack: a model trained here can be
loaded by ``vxm.networks.VxmDense.load`` (`bids_registration.py:439`), whose
h5 reader consumes exactly this legacy-HDF5 layout.
"""

from __future__ import annotations

import numpy as np

from multimodal_registration_tpu.models.h5_import import conv_module_order
from multimodal_registration_tpu.models.vxm_dense import VxmConfig


def export_keras_vxm_h5(params, cfg: VxmConfig, h5path: str):
    """Write ``params`` (our pytree) as a Keras legacy-h5 weight file."""
    import h5py

    p = params["params"]
    layers = []  # (layer_name, kernel, bias)
    for li, name in enumerate(conv_module_order(cfg)):
        sub = p["unet"][name]["conv"]
        layers.append((f"vxm_dense_conv_{li}", sub["kernel"], sub["bias"]))
    layers.append((f"vxm_dense_conv_{len(layers)}", p["flow"]["kernel"], p["flow"]["bias"]))

    with h5py.File(h5path, "w") as f:
        mw = f.create_group("model_weights")
        for lname, kernel, bias in layers:
            g = mw.create_group(lname)
            g.create_dataset(f"{lname}/kernel:0", data=np.asarray(kernel, np.float32))
            g.create_dataset(f"{lname}/bias:0", data=np.asarray(bias, np.float32))
            g.attrs["weight_names"] = [
                f"{lname}/kernel:0".encode(), f"{lname}/bias:0".encode()
            ]
        mw.attrs["layer_names"] = [l[0].encode() for l in layers]
