"""TorchScript checkpoint importer (no torch dependency).

The reference ships pretrained models as TorchScript archives
(/root/reference/pretrained/*/checkpoints/*/stereo_network.pt, loaded with
torch.jit.load at test.py:311). Those archives embed torch-1.5-era scripted
code that modern torch refuses to re-compile, so we bypass TorchScript
entirely: the archive is a zip whose ``data.pkl`` pickles the module
attribute tree with tensors referencing raw little-endian storage blobs at
``<name>/data/<key>``. A custom Unpickler reconstructs the tree with shim
objects and materializes tensors as numpy arrays.

``convert_reference_state_dict`` then maps the dotted torch parameter names
onto this framework's param pytree, transposing conv kernels
OIHW -> HWIO and OIDHW -> DHWIO for the NHWC/NDHWC layouts.
"""

from __future__ import annotations

import io
import pickle
import zipfile

import numpy as np

_DTYPES = {
    "FloatStorage": np.float32,
    "DoubleStorage": np.float64,
    "HalfStorage": np.float16,
    "LongStorage": np.int64,
    "IntStorage": np.int32,
    "ShortStorage": np.int16,
    "CharStorage": np.int8,
    "ByteStorage": np.uint8,
    "BoolStorage": np.bool_,
}


class _Shim:
    """Generic stand-in for any pickled torch class: records its state."""

    def __init__(self, *args, **kwargs):
        self._args = args

    def __setstate__(self, state):
        self.__dict__.update(state if isinstance(state, dict) else {"_state": state})


def _build_intlist(values):
    return list(values)


def _build_tensor_from_storage(storage, offset, size, stride, *unused):
    dtype, data = storage
    arr = np.frombuffer(data, dtype=dtype)
    if offset:
        arr = arr[offset:]
    return np.lib.stride_tricks.as_strided(
        arr, shape=tuple(size),
        strides=tuple(s * arr.itemsize for s in stride)).copy()


class _Unpickler(pickle.Unpickler):
    def __init__(self, file, storages):
        super().__init__(file)
        self._storages = storages

    def persistent_load(self, pid):
        kind, storage_cls, key, _location, _numel = pid
        assert kind == "storage"
        name = getattr(storage_cls, "_torch_storage_name", None) or storage_cls
        return (_DTYPES[name], self._storages[key])

    def find_class(self, module, name):
        if module == "torch._utils" and name == "_rebuild_tensor_v2":
            return _build_tensor_from_storage
        if module == "torch.jit._pickle":
            return _build_intlist
        if module == "torch" and name.endswith("Storage"):
            cls = type(name, (), {"_torch_storage_name": name})
            return cls
        if module.startswith("__torch__") or module.startswith("torch"):
            return type(name, (_Shim,), {})
        return super().find_class(module, name)


def _collect_tensors(obj, prefix, out):
    if isinstance(obj, np.ndarray):
        out[prefix] = obj
        return
    if isinstance(obj, _Shim) or hasattr(obj, "__dict__"):
        for k, v in vars(obj).items():
            if k.startswith("_") or k == "training":
                continue
            name = f"{prefix}.{k}" if prefix else k
            if isinstance(v, (np.ndarray, _Shim)) or hasattr(v, "__dict__"):
                _collect_tensors(v, name, out)


def load_torchscript_weights(path: str) -> dict:
    """Extract {dotted_name: np.ndarray} from a TorchScript archive."""
    with zipfile.ZipFile(path) as z:
        names = z.namelist()
        root = names[0].split("/")[0]
        storages = {}
        for n in names:
            parts = n.split("/")
            if len(parts) >= 2 and parts[-2] == "data" and parts[-1] != "pkl":
                storages[parts[-1]] = z.read(n)
        pkl = z.read(f"{root}/data.pkl")
    module = _Unpickler(io.BytesIO(pkl), storages).load()
    tensors: dict = {}
    _collect_tensors(module, "", tensors)
    return tensors


def _t4(w: np.ndarray) -> np.ndarray:
    """torch OIHW conv kernel -> HWIO."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _t5(w: np.ndarray) -> np.ndarray:
    """torch OIDHW conv3d kernel -> DHWIO."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 4, 1, 0)))


def _conv(sd, name, bias=True):
    p = {"w": _t4(sd[f"{name}.weight"])}
    if bias:
        p["b"] = sd[f"{name}.bias"]
    return p


def _conv3(sd, name, bias=True):
    p = {"w": _t5(sd[f"{name}.weight"])}
    if bias:
        p["b"] = sd[f"{name}.bias"]
    return p


def _gn(sd, name):
    return {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}


def _res(sd, name, bias=True):
    return {"conv": _conv(sd, f"{name}.conv1", bias), "gn": _gn(sd, f"{name}.bn1")}


def convert_reference_state_dict(sd: dict) -> dict:
    """Map reference parameter names onto this framework's param pytree.

    Names follow the reference module hierarchy
    (multi_view_stereonet.py:494-534); the right extractor shares the left
    extractor's weights (:507), so only ``left_feature_extractor.*`` and
    ``right_feature_extractor.refiner.*`` are read.
    """
    import jax.numpy as jnp

    fn = {}
    pre = "left_feature_extractor"
    for i in range(4):
        fn[f"conv{i}"] = _conv(sd, f"{pre}.conv{i}", bias=False)
    for i in range(6):
        fn[f"res{i}"] = _res(sd, f"{pre}.res{i}", bias=False)
    fn["conv_final"] = _conv(sd, f"{pre}.conv_final")

    fr = {
        "conv0": _conv(sd, "right_feature_extractor.refiner.conv0"),
        "gn0": _gn(sd, "right_feature_extractor.refiner.bn0"),
        "res0": _res(sd, "right_feature_extractor.refiner.res0"),
        "conv_final": _conv(sd, "right_feature_extractor.refiner.conv_final"),
    }

    vf = {}
    for i in range(4):
        vf[f"conv{i}"] = _conv3(sd, f"volume_filter4.conv{i}")
        vf[f"gn{i}"] = _gn(sd, f"volume_filter4.bn{i}")
    vf["conv4"] = _conv3(sd, "volume_filter4.conv4")

    params = {
        "feature_network": fn,
        "feature_refiner": fr,
        "volume_filter4": vf,
    }
    for lvl in range(5):
        pre = f"refiner{lvl}"
        r = {
            "conv0": _conv(sd, f"{pre}.conv0"),
            "gn0": _gn(sd, f"{pre}.bn0"),
            "conv_final": _conv(sd, f"{pre}.conv_final"),
        }
        for i in range(6):
            r[f"res{i}"] = _res(sd, f"{pre}.res{i}")
        params[pre] = r

    import jax

    return jax.tree.map(lambda a: jnp.asarray(np.asarray(a)), params)
