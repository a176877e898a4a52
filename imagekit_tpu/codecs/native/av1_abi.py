"""ctypes bindings for the native AV1 entropy engine (av1_enc.cpp).

The native engine is a byte-exact twin of av1_entropy.MsacEncoder +
av1_intra.TileEncoder.encode_txb (pinned by tests/test_av1_native.py's
equality suite and the dav1d conformance gates).  `IMAGEKIT_AV1_NATIVE=0`
forces the pure-Python path.
"""

from __future__ import annotations

import ctypes
import os
import threading
from typing import Optional

import numpy as np

from . import loader

_lock = threading.Lock()
_state: dict = {"lib": None, "attempted": False}


# expected table shapes — the C engine hard-codes these strides
_SHAPES = {
    "txb_skip": (4, 5, 13, 3),
    "intra_ext_tx2": (4, 13, 6),
    "eob_pt_16": (4, 2, 2, 6),
    "eob_pt_64": (4, 2, 2, 8),
    "eob_pt_256": (4, 2, 2, 10),
    "eob_pt_1024": (4, 2, 2, 12),
    "eob_extra": (4, 5, 2, 9, 3),
    "coeff_base_eob": (4, 5, 2, 4, 4),
    "coeff_base": (4, 5, 2, 42, 5),
    "coeff_br": (4, 5, 2, 21, 5),
    "dc_sign": (4, 2, 3, 3),
    "scan_4x4": (16,),
    "scan_8x8": (64,),
    "scan_16x16": (256,),
    "scan_32x32": (1024,),
}


def _bind(lib: ctypes.CDLL) -> None:
    lib.ik_msac_new.restype = ctypes.c_void_p
    lib.ik_msac_free.argtypes = [ctypes.c_void_p]
    lib.ik_msac_reset.argtypes = [ctypes.c_void_p]
    lib.ik_msac_symbol.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                   ctypes.c_int, ctypes.c_int]
    lib.ik_msac_symbol_adapt.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                         ctypes.c_int, ctypes.c_int]
    lib.ik_msac_literal.argtypes = [ctypes.c_void_p, ctypes.c_uint32,
                                    ctypes.c_int]
    lib.ik_msac_golomb.argtypes = [ctypes.c_void_p, ctypes.c_uint32]
    lib.ik_msac_nbits.argtypes = [ctypes.c_void_p]
    lib.ik_msac_nbits.restype = ctypes.c_longlong
    lib.ik_msac_done.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                 ctypes.c_int]
    lib.ik_msac_done.restype = ctypes.c_int
    lib.ik_msac_clone.argtypes = [ctypes.c_void_p]
    lib.ik_msac_clone.restype = ctypes.c_void_p
    lib.ik_msac_assign.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.ik_av1_bind_tables.argtypes = [ctypes.c_void_p] * 15
    lib.ik_av1_txb.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
                               ctypes.c_int, ctypes.c_void_p, ctypes.c_int,
                               ctypes.c_int, ctypes.c_int, ctypes.c_int,
                               ctypes.c_void_p, ctypes.c_int]
    lib.ik_av1_txb.restype = ctypes.c_int
    lib.ik_av1_recon.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                 ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                 ctypes.c_int, ctypes.c_void_p]
    lib.ik_av1_leaf_eval.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                     ctypes.c_int, ctypes.c_int,
                                     ctypes.c_int, ctypes.c_int,
                                     ctypes.c_void_p, ctypes.c_void_p,
                                     ctypes.c_void_p]
    lib.ik_av1_leaf_eval.restype = ctypes.c_longlong


def load() -> Optional[ctypes.CDLL]:
    """The shared native library with tables bound, or None (missing
    symbols / disabled by env / shape drift)."""
    with _lock:
        if _state["attempted"]:
            return _state["lib"]
        _state["attempted"] = True
        if os.environ.get("IMAGEKIT_AV1_NATIVE", "1") in ("0", "off"):
            return None
        lib = loader.load()
        if lib is None or not hasattr(lib, "ik_av1_txb"):
            return None
        try:
            _bind(lib)
            from ..av1_entropy import tables

            T = tables()
            holders = []
            ptrs = []
            for name, shape in _SHAPES.items():
                arr = np.ascontiguousarray(T[name])
                if arr.shape != shape:
                    return None                 # stride drift: stay Python
                holders.append(arr)             # keep buffers alive
                ptrs.append(arr.ctypes.data_as(ctypes.c_void_p))
            lib.ik_av1_bind_tables(*ptrs)
            _state["holders"] = holders
        except Exception:
            return None
        _state["lib"] = lib
        return lib


def available() -> bool:
    return load() is not None
