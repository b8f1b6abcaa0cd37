"""Torch ``.pt`` checkpoint IO without a hard torch dependency.

The reference reads/writes ``torch.save`` dicts everywhere (OpenAI CLIP
weights, 4-module train checkpoints, the knowledge-database tensors
``cc_{image,text}_databases.pt``).  TPU hosts often have no torch install, so
:func:`load_pt` ships a pure-Python reader for the torch zip serialization
format (a zip archive holding ``data.pkl`` with persistent-id references into
``data/<key>`` raw storage blobs).  Tensors come back as numpy arrays.

When torch *is* importable it is used for writing (:func:`save_pt`) and as a
fallback reader for legacy/non-zip files.
"""

from __future__ import annotations

import io
import os
import pickle
import zipfile
from typing import Any

import numpy as np

try:
    import ml_dtypes

    _BFLOAT16 = np.dtype(ml_dtypes.bfloat16)
except Exception:  # pragma: no cover
    _BFLOAT16 = None


_STORAGE_DTYPES = {
    "FloatStorage": np.dtype("<f4"),
    "DoubleStorage": np.dtype("<f8"),
    "HalfStorage": np.dtype("<f2"),
    "LongStorage": np.dtype("<i8"),
    "IntStorage": np.dtype("<i4"),
    "ShortStorage": np.dtype("<i2"),
    "CharStorage": np.dtype("i1"),
    "ByteStorage": np.dtype("u1"),
    "BoolStorage": np.dtype("bool"),
}
if _BFLOAT16 is not None:
    _STORAGE_DTYPES["BFloat16Storage"] = _BFLOAT16


class _StorageRef:
    """Lazy handle to a raw storage blob inside the zip archive."""

    __slots__ = ("dtype", "key", "numel", "loader")

    def __init__(self, dtype, key, numel, loader):
        self.dtype, self.key, self.numel, self.loader = dtype, key, numel, loader

    def data(self) -> np.ndarray:
        raw = self.loader(self.key)
        return np.frombuffer(raw, dtype=self.dtype, count=self.numel)


def _rebuild_tensor(storage: _StorageRef, offset, size, stride, *_args, **_kw):
    flat = storage.data()
    if not size:
        return flat[offset].copy()
    itemsize = flat.dtype.itemsize
    strided = np.lib.stride_tricks.as_strided(
        flat[offset:],
        shape=tuple(size),
        strides=tuple(s * itemsize for s in stride),
        writeable=False,
    )
    return np.array(strided)  # materialize a contiguous copy


def _rebuild_from_type_v2(func, new_type, args, state):
    # torch >= 2 wraps some tensors (e.g. Parameters) this way.
    return func(*args)


class _Stub:
    """Generic stand-in for unknown torch classes appearing in pickles
    (e.g. argparse namespaces inside optimizer states)."""

    def __init__(self, *a, **k):
        pass

    def __setstate__(self, state):
        self.__dict__.update(state if isinstance(state, dict) else {"state": state})


class _TorchFreeUnpickler(pickle.Unpickler):
    def __init__(self, file, loader):
        super().__init__(file)
        self._loader = loader

    def find_class(self, module: str, name: str):
        if name == "_rebuild_tensor_v2":
            return _rebuild_tensor
        if name == "_rebuild_parameter":
            return lambda data, requires_grad, hooks: data
        if name == "_rebuild_from_type_v2":
            return _rebuild_from_type_v2
        if module.startswith("torch") and name in _STORAGE_DTYPES:
            return _STORAGE_DTYPES[name]
        if module.startswith("torch") and name.endswith("Storage"):
            raise pickle.UnpicklingError(f"unsupported torch storage type {name}")
        if module == "torch" and name in ("float32", "float16", "bfloat16", "int64",
                                          "int32", "float64", "uint8", "bool"):
            return name
        if module in ("collections", "builtins") or module.startswith("numpy"):
            return super().find_class(module, name)
        if module.startswith("torch"):
            return _Stub
        # Unknown third-party classes (argparse etc.) -> inert stub.
        return _Stub

    def persistent_load(self, pid):
        kind = pid[0]
        if kind != "storage":
            raise pickle.UnpicklingError(f"unknown persistent id {kind!r}")
        storage_type, key, _location, numel = pid[1], pid[2], pid[3], pid[4]
        if isinstance(storage_type, np.dtype):
            dtype = storage_type
        elif isinstance(storage_type, str):
            dtype = _STORAGE_DTYPES.get(storage_type)
            if dtype is None:
                raise pickle.UnpicklingError(f"unsupported storage {storage_type}")
        else:  # torch.dtype-style wrapper (UntypedStorage path)
            dtype = np.dtype("u1")
        return _StorageRef(dtype, key, numel, self._loader)


def _load_pt_zip(path: str) -> Any:
    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
        pkl_name = next(n for n in names if n.endswith("data.pkl"))
        prefix = pkl_name[: -len("data.pkl")]

        def loader(key: str) -> bytes:
            return zf.read(f"{prefix}data/{key}")

        with zf.open(pkl_name) as f:
            return _TorchFreeUnpickler(io.BytesIO(f.read()), loader).load()


def _to_numpy_tree(obj: Any) -> Any:
    """Recursively convert torch tensors to numpy (torch-backed load path)."""
    import torch

    if isinstance(obj, torch.Tensor):
        t = obj.detach().cpu()
        if t.dtype == torch.bfloat16:
            if _BFLOAT16 is not None:
                return t.view(torch.int16).numpy().view(_BFLOAT16)
            return t.float().numpy()
        return t.numpy()
    if isinstance(obj, dict):
        return {k: _to_numpy_tree(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        seq = [_to_numpy_tree(v) for v in obj]
        return type(obj)(seq) if isinstance(obj, tuple) else seq
    return obj


def load_pt(path: str, use_torch: str = "auto") -> Any:
    """Load a torch .pt file; tensors are returned as numpy arrays.

    ``use_torch``: "auto" tries the pure reader for zip-format files and falls
    back to torch; "never" forces the pure reader; "always" requires torch.
    """
    if use_torch != "always" and zipfile.is_zipfile(path):
        try:
            return _load_pt_zip(path)
        except Exception:
            if use_torch == "never":
                raise
    if use_torch == "never":
        raise RuntimeError(f"{path} is not a torch zip archive; pure reader cannot load it")
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    return _to_numpy_tree(obj)


def save_pt(obj: Any, path: str) -> None:
    """Write a reference-compatible .pt file (requires torch; numpy arrays in
    ``obj`` are converted to torch tensors)."""
    import torch

    def conv(x):
        if isinstance(x, np.ndarray):
            if _BFLOAT16 is not None and x.dtype == _BFLOAT16:
                return torch.from_numpy(x.view(np.int16).copy()).view(torch.bfloat16)
            return torch.from_numpy(np.ascontiguousarray(x))
        if isinstance(x, dict):
            return {k: conv(v) for k, v in x.items()}
        if isinstance(x, tuple):
            seq = [conv(v) for v in x]
            # namedtuples (e.g. optax states) reconstruct positionally
            return type(x)(*seq) if hasattr(x, "_fields") else tuple(seq)
        if isinstance(x, list):
            return [conv(v) for v in x]
        if hasattr(x, "dtype") and hasattr(x, "__array__"):  # jax arrays
            return conv(np.asarray(x))
        return x

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    # Atomic write: a crash mid-save must not leave a truncated epoch_N.pt
    # for --resume auto to pick up (same temp-then-rename discipline as the
    # weight-download path).
    tmp = path + ".tmp"
    torch.save(conv(obj), tmp)
    os.replace(tmp, path)
