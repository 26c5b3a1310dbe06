"""ctypes bindings for the native block/IO runtime (native/spimblocks.cpp).

Reference parity (SURVEY.md section 2.8): `Block` /
`BlockGeneratorFixedSizePrecise` semantics (interior blocks + clamped
halos + per-face pad amounts) and a threaded raw-volume block store for
larger-than-memory streaming. Builds the shared library on first use;
falls back to a numpy memmap implementation when no compiler is present.
"""

from __future__ import annotations

import ctypes
import dataclasses
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libspimblocks.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "spimblocks.cpp")

_lib: Optional[ctypes.CDLL] = None
_lib_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-o", _SO_PATH, _SRC_PATH, "-lpthread"],
            check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library, or None."""
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    if not os.path.exists(_SO_PATH) or (
            os.path.exists(_SRC_PATH)
            and os.path.getmtime(_SRC_PATH) > os.path.getmtime(_SO_PATH)):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None
    i64p = ctypes.POINTER(ctypes.c_int64)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.spim_block_decompose.restype = ctypes.c_int64
    lib.spim_block_decompose.argtypes = [i64p, i64p, i64p, ctypes.c_void_p,
                                         ctypes.c_int64]
    lib.spim_read_block_f32.restype = ctypes.c_int
    lib.spim_read_block_f32.argtypes = [ctypes.c_char_p, i64p, i64p, i64p,
                                        f32p, ctypes.c_int]
    lib.spim_write_block_f32.restype = ctypes.c_int
    lib.spim_write_block_f32.argtypes = [ctypes.c_char_p, i64p, i64p, i64p,
                                         f32p, ctypes.c_int]
    lib.spim_create_raw_f32.restype = ctypes.c_int
    lib.spim_create_raw_f32.argtypes = [ctypes.c_char_p, i64p]
    _lib = lib
    return _lib


def _i64(v) -> "ctypes.Array":
    return (ctypes.c_int64 * 3)(*[int(x) for x in v])


@dataclasses.dataclass
class Block:
    """One decomposition block (BlockGeneratorFixedSizePrecise record)."""

    out_lo: Tuple[int, int, int]   # interior (exclusive ownership)
    out_hi: Tuple[int, int, int]
    in_lo: Tuple[int, int, int]    # clamped padded read range
    in_hi: Tuple[int, int, int]
    pad_lo: Tuple[int, int, int]   # halo clipped at volume faces
    pad_hi: Tuple[int, int, int]


def decompose(dims, block, halo) -> List[Block]:
    """Split `dims` into interior blocks of `block` with `halo` overlap."""
    lib = get_lib()
    if lib is not None:
        n = lib.spim_block_decompose(_i64(dims), _i64(block), _i64(halo),
                                     None, 0)
        buf = np.zeros((n, 18), np.int64)
        rc = lib.spim_block_decompose(
            _i64(dims), _i64(block), _i64(halo),
            buf.ctypes.data_as(ctypes.c_void_p), n)
        assert rc == n
        rows = buf
    else:  # pure-python fallback
        rows = []
        nb = [-(-d // b) for d, b in zip(dims, block)]
        for bz in range(nb[0]):
            for by in range(nb[1]):
                for bx in range(nb[2]):
                    rec = []
                    for d, bi in zip(range(3), (bz, by, bx)):
                        lo = bi * block[d]
                        hi = min(lo + block[d], dims[d])
                        wl, wh = lo - halo[d], hi + halo[d]
                        il, ih = max(wl, 0), min(wh, dims[d])
                        rec.append((lo, hi, il, ih, il - wl, wh - ih))
                    rows.append([r[i] for i in range(6) for r in rec])
        rows = np.asarray(rows, np.int64).reshape(-1, 18)
    out = []
    for r in rows:
        out.append(Block(tuple(r[0:3]), tuple(r[3:6]), tuple(r[6:9]),
                         tuple(r[9:12]), tuple(r[12:15]), tuple(r[15:18])))
    return out


class RawVolumeStore:
    """Raw float32 volume on disk with threaded strided block IO.

    The streaming substrate for larger-than-memory processing (the
    reference's per-block source re-reads, without the JVM in the way).
    """

    def __init__(self, path: str, shape, create: bool = False,
                 n_threads: int = 8):
        self.path = path
        self.shape = tuple(int(s) for s in shape)
        self.n_threads = n_threads
        self._lib = get_lib()
        if create:
            if self._lib is not None:
                rc = self._lib.spim_create_raw_f32(path.encode(),
                                                   _i64(self.shape))
                if rc != 0:
                    raise OSError(f"create failed rc={rc}")
            else:
                np.lib.format.open_memmap  # noqa: B018
                with open(path, "wb") as f:
                    f.truncate(int(np.prod(self.shape)) * 4)

    def _check_range(self, lo, hi):
        for d in range(3):
            if not (0 <= lo[d] < hi[d] <= self.shape[d]):
                raise ValueError(
                    f"invalid block range axis {d}: [{lo[d]}, {hi[d]}) "
                    f"for volume of shape {self.shape}")

    def read_block(self, lo, hi) -> np.ndarray:
        lo = tuple(int(v) for v in lo)
        hi = tuple(int(v) for v in hi)
        self._check_range(lo, hi)
        shape = tuple(h - l for l, h in zip(lo, hi))
        if self._lib is not None:
            dst = np.empty(shape, np.float32)
            rc = self._lib.spim_read_block_f32(
                self.path.encode(), _i64(self.shape), _i64(lo), _i64(hi),
                dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                self.n_threads)
            if rc != 0:
                raise OSError(f"read failed rc={rc}")
            return dst
        mm = np.memmap(self.path, np.float32, "r", shape=self.shape)
        return np.array(mm[lo[0]:hi[0], lo[1]:hi[1], lo[2]:hi[2]])

    def write_block(self, lo, data: np.ndarray) -> None:
        lo = tuple(int(v) for v in lo)
        hi = tuple(l + s for l, s in zip(lo, data.shape))
        self._check_range(lo, hi)
        data = np.ascontiguousarray(data, np.float32)
        if self._lib is not None:
            rc = self._lib.spim_write_block_f32(
                self.path.encode(), _i64(self.shape), _i64(lo), _i64(hi),
                data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                self.n_threads)
            if rc != 0:
                raise OSError(f"write failed rc={rc}")
            return
        mm = np.memmap(self.path, np.float32, "r+", shape=self.shape)
        mm[lo[0]:hi[0], lo[1]:hi[1], lo[2]:hi[2]] = data
        mm.flush()

    def read_block_padded(self, blk: Block, mode: str = "reflect"
                          ) -> np.ndarray:
        """Read a decomposition block including halos, mirror-filling the
        clipped faces (the reference's OOB-mirror semantics)."""
        core = self.read_block(blk.in_lo, blk.in_hi)
        pads = tuple((int(a), int(b))
                     for a, b in zip(blk.pad_lo, blk.pad_hi))
        if any(a or b for a, b in pads):
            core = np.pad(core, pads, mode=mode)
        return core
