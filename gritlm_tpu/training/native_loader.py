"""ctypes binding for the native C++ data loader (native/gritloader.cpp).

Produces the same fixed-shape batch dicts as GritCollator/batch_iterator but
with JSONL parsing, template formatting, byte tokenization and batch packing
running in a C++ background thread — the host input pipeline overlaps device
compute instead of blocking the train loop on the GIL.

Covers the ByteTokenizer path (smoke/bench runs). HF-tokenizer training uses
the Python pipeline. The library auto-builds with `make -C native` on first
use if g++ is available.
"""

from __future__ import annotations

import ctypes
import glob
import os
import subprocess
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libgritloader.so"))


def build_library(force: bool = False) -> str:
    if force or not os.path.exists(_LIB_PATH):
        subprocess.run(
            ["make", "-C", os.path.abspath(_NATIVE_DIR)],
            check=True, capture_output=True,
        )
    return _LIB_PATH


_lib = None


def _load():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(build_library())
        lib.gl_create.restype = ctypes.c_void_p
        lib.gl_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_uint64, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        for name in ("gl_num_emb", "gl_num_gen", "gl_num_batches"):
            getattr(lib, name).restype = ctypes.c_int
            getattr(lib, name).argtypes = [ctypes.c_void_p]
        lib.gl_start_epoch.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        lib.gl_next.restype = ctypes.c_int
        lib.gl_next.argtypes = [
            ctypes.c_void_p, i32p, i32p, i32p, i32p, i32p, i32p,
            i32p, i32p, i64p, ctypes.POINTER(ctypes.c_int32),
        ]
        lib.gl_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
    return _lib


class NativeGritLoader:
    def __init__(
        self,
        train_data: Sequence[str],
        batch_size: int,
        train_group_size: int = 2,
        query_max_len: int = 256,
        passage_max_len: int = 2048,
        generative_max_len: int = 2048,
        seed: int = 42,
        take_nth: int = 1,
        prefetch_depth: int = 4,
        max_char_len: Optional[int] = None,
    ):
        lib = _load()
        files: List[str] = []
        for p in train_data:
            if os.path.isdir(p):
                files.extend(sorted(glob.glob(os.path.join(p, "*.jsonl"))))
            else:
                files.append(p)
        arr = (ctypes.c_char_p * len(files))(*[f.encode() for f in files])
        self._lib = lib
        self.batch_size = batch_size
        self.group_size = train_group_size
        self.qlen, self.plen, self.glen = (
            query_max_len, passage_max_len, generative_max_len,
        )
        self.take_nth = take_nth
        self._h = lib.gl_create(
            arr, len(files), batch_size, train_group_size,
            query_max_len, passage_max_len, generative_max_len,
            seed, take_nth, prefetch_depth,
            max_char_len or max(passage_max_len, generative_max_len) * 10,
        )
        self.n_emb = lib.gl_num_emb(self._h)
        self.n_gen = lib.gl_num_gen(self._h)

    def epoch(self, epoch: int = 0) -> Iterator[Dict[str, Dict[str, np.ndarray]]]:
        lib = self._lib
        lib.gl_start_epoch(self._h, epoch)
        B, G = self.batch_size, self.group_size
        n_gen = -(-B // self.take_nth)  # ceil
        while True:
            q_ids = np.empty((B, self.qlen), np.int32)
            q_mask = np.empty((B, self.qlen), np.int32)
            q_il = np.empty((B,), np.int32)
            p_ids = np.empty((B * G, self.plen), np.int32)
            p_mask = np.empty((B * G, self.plen), np.int32)
            p_il = np.empty((B * G,), np.int32)
            g_ids = np.empty((n_gen, self.glen), np.int32)
            g_mask = np.empty((n_gen, self.glen), np.int32)
            g_labels = np.empty((n_gen, self.glen), np.int64)
            g_count = ctypes.c_int32(0)
            ok = lib.gl_next(
                self._h, q_ids, q_mask, q_il, p_ids, p_mask, p_il,
                g_ids, g_mask, g_labels, ctypes.byref(g_count),
            )
            if not ok:
                return
            batch = {
                "query": {
                    "input_ids": q_ids, "attention_mask": q_mask,
                    "instruction_lens": q_il,
                },
                "passage": {
                    "input_ids": p_ids, "attention_mask": p_mask,
                    "instruction_lens": p_il,
                },
            }
            if g_count.value:
                n = g_count.value
                batch["generative"] = {
                    "input_ids": g_ids[:n], "attention_mask": g_mask[:n],
                    "labels": g_labels[:n],
                }
            yield batch

    def num_batches(self) -> int:
        return self._lib.gl_num_batches(self._h)

    def close(self) -> None:
        if self._h:
            self._lib.gl_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
