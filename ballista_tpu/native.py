"""ctypes bindings for the native host kernels (native/ballista_native.cpp).

Auto-builds the .so on first use if a toolchain is available; every entry
point has a pure-numpy fallback so the engine works without it.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

log = logging.getLogger("ballista_tpu.native")

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libballista_native.so")

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception as e:  # noqa: BLE001 - fall back to numpy path
            log.info("native build unavailable (%s); using numpy fallback", e)
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
        lib.bt_dict_encode.restype = ctypes.c_int64
        lib.bt_dict_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p]
        lib.bt_dict_encode_against.restype = ctypes.c_int64
        lib.bt_dict_encode_against.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p]
        _lib = lib
    except OSError as e:
        log.info("native load failed (%s); using numpy fallback", e)
    return _lib


def _arrow_string_buffers(arr) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """(data bytes, int32 offsets) of a non-null pyarrow string array."""
    import pyarrow as pa
    if not pa.types.is_string(arr.type):
        return None
    if arr.offset != 0:
        arr = arr.combine_chunks() if hasattr(arr, "combine_chunks") else arr
        arr = pa.concat_arrays([arr])  # re-materialize at offset 0
    bufs = arr.buffers()
    if bufs[2] is None:
        return None
    offsets = np.frombuffer(bufs[1], dtype=np.int32, count=len(arr) + 1)
    data = np.frombuffer(bufs[2], dtype=np.uint8)
    return data, offsets


def dict_encode_arrow(arr):
    """Sorted-dictionary-encode a pyarrow string array (nulls pre-filled).

    Returns (codes int32[n], dictionary object[nd]) or None if the native
    path is unavailable for this input.
    """
    lib = _load()
    if lib is None:
        return None
    bufs = _arrow_string_buffers(arr)
    if bufs is None:
        return None
    data, offsets = bufs
    n = len(arr)
    codes = np.empty(n, dtype=np.int32)
    dict_rows = np.empty(max(n, 1), dtype=np.int32)
    nd = lib.bt_dict_encode(
        data.ctypes.data if len(data) else None,
        offsets.ctypes.data, n, codes.ctypes.data, dict_rows.ctypes.data)
    if nd < 0:
        return None
    raw = data.tobytes()
    dictionary = np.empty(nd, dtype=object)
    for i in range(nd):
        r = dict_rows[i]
        dictionary[i] = raw[offsets[r]:offsets[r + 1]].decode("utf-8")
    return codes, dictionary


def dict_encode_against_arrow(arr, dictionary: np.ndarray):
    """Encode a pyarrow string array against an existing sorted dictionary.
    Unknown values get code -1. Returns codes int32[n] or None."""
    lib = _load()
    if lib is None:
        return None
    bufs = _arrow_string_buffers(arr)
    if bufs is None:
        return None
    data, offsets = bufs
    n = len(arr)
    dstrs = [str(s).encode("utf-8") for s in dictionary]
    dict_offsets = np.zeros(len(dstrs) + 1, dtype=np.int32)
    for i, s in enumerate(dstrs):
        dict_offsets[i + 1] = dict_offsets[i] + len(s)
    dict_data = np.frombuffer(b"".join(dstrs), dtype=np.uint8) if dstrs else \
        np.zeros(0, dtype=np.uint8)
    codes = np.empty(n, dtype=np.int32)
    lib.bt_dict_encode_against(
        data.ctypes.data if len(data) else None, offsets.ctypes.data, n,
        dict_data.ctypes.data if len(dict_data) else None,
        dict_offsets.ctypes.data, len(dstrs), codes.ctypes.data)
    return codes
