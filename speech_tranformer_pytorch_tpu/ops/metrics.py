"""CER/WER scoring via edit distance (reference: ``cal_cer`` /
``editdistance`` usage in the eval script — SURVEY.md §2.1 "CER scoring").

The O(N·M) Levenshtein inner loop is host-side scoring code, so it gets a
native C++ implementation (``native/editdistance.cc`` loaded via ctypes —
the reference leans on the ``editdistance`` C extension wheel); a pure-Python
fallback keeps the package dependency-free.
"""

from __future__ import annotations

import ctypes
import os
from typing import Dict, List, Sequence, Tuple

_LIB = None                 # library with the per-pair symbol bound
_LIB_HAS_CORPUS = False     # batched corpus symbol also present (newer .so)
_LIB_TRIED = False


def _build_native(so: str) -> None:
    """Best-effort `make` of the .so (it is a build artifact, not versioned)."""
    import subprocess

    try:
        subprocess.run(
            ["make", "-s"], cwd=os.path.dirname(so), timeout=120,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL, check=False)
    except (OSError, subprocess.SubprocessError):
        pass


def _load_native():
    global _LIB, _LIB_HAS_CORPUS, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    so = os.path.join(os.path.dirname(__file__), "..", "native", "libeditdistance.so")
    so = os.path.abspath(so)
    if not os.path.exists(so):
        _build_native(so)
    if os.path.exists(so):
        try:
            lib = ctypes.CDLL(so)
            lib.edit_distance_i32.restype = ctypes.c_int64
            lib.edit_distance_i32.argtypes = [
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ]
            _LIB = lib
        except (OSError, AttributeError):
            _LIB = None
        # The batched corpus entry point shipped later than the per-pair one;
        # a stale .so that lacks it should still serve the per-pair path.
        if _LIB is not None:
            try:
                p_i32 = ctypes.POINTER(ctypes.c_int32)
                p_i64 = ctypes.POINTER(ctypes.c_int64)
                _LIB.edit_distance_corpus_i32.restype = None
                _LIB.edit_distance_corpus_i32.argtypes = [
                    p_i32, p_i64, p_i32, p_i64, ctypes.c_int64, p_i64,
                ]
                _LIB_HAS_CORPUS = True
            except AttributeError:
                _LIB_HAS_CORPUS = False
    return _LIB


def _edit_distance_py(ref: Sequence[int], hyp: Sequence[int]) -> int:
    n, m = len(ref), len(hyp)
    if n == 0:
        return m
    if m == 0:
        return n
    prev = list(range(m + 1))
    for i in range(1, n + 1):
        cur = [i] + [0] * m
        ri = ref[i - 1]
        for j in range(1, m + 1):
            cost = 0 if ri == hyp[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
        prev = cur
    return prev[m]


def edit_distance(ref: Sequence[int], hyp: Sequence[int]) -> int:
    """Levenshtein distance between two token-id sequences."""
    lib = _load_native()
    if lib is not None:
        a = (ctypes.c_int32 * len(ref))(*[int(x) for x in ref])
        b = (ctypes.c_int32 * len(hyp))(*[int(x) for x in hyp])
        return int(lib.edit_distance_i32(a, len(ref), b, len(hyp)))
    return _edit_distance_py(list(ref), list(hyp))


def _corpus_errors_native(lib, refs, hyps) -> Tuple[int, int]:
    """One ctypes call for the whole corpus via the flat-buffer batched C++
    entry point (``edit_distance_corpus_i32``): two numpy flattens replace
    the two per-utterance ctypes array copies of the per-pair path — on a
    real 7k-utterance eval set the marshalling overhead disappears."""
    import numpy as np

    def flat(seqs):
        off = np.zeros(len(seqs) + 1, np.int64)
        off[1:] = np.cumsum([len(s) for s in seqs])
        buf = np.zeros(max(int(off[-1]), 1), np.int32)
        for s, o in zip(seqs, off[:-1]):
            if len(s):
                buf[int(o):int(o) + len(s)] = np.asarray(s, np.int32)
        return buf, off

    rbuf, roff = flat(refs)
    hbuf, hoff = flat(hyps)
    out = np.zeros(2, np.int64)
    p_i32 = ctypes.POINTER(ctypes.c_int32)
    p_i64 = ctypes.POINTER(ctypes.c_int64)
    lib.edit_distance_corpus_i32(
        rbuf.ctypes.data_as(p_i32), roff.ctypes.data_as(p_i64),
        hbuf.ctypes.data_as(p_i32), hoff.ctypes.data_as(p_i64),
        ctypes.c_int64(len(refs)), out.ctypes.data_as(p_i64))
    return int(out[0]), int(out[1])


def cer(refs: List[Sequence[int]], hyps: List[Sequence[int]]) -> Dict[str, float]:
    """Character error rate over a corpus of token-id sequences.

    Returns dict with ``cer`` (%), total ``errors`` and ``ref_tokens``.
    """
    if len(refs) != len(hyps):
        raise ValueError(f"refs ({len(refs)}) and hyps ({len(hyps)}) differ in count")
    lib = _load_native()
    if lib is not None and _LIB_HAS_CORPUS and refs:
        errors, total = _corpus_errors_native(lib, refs, hyps)
    else:
        errors = 0
        total = 0
        for r, h in zip(refs, hyps):
            errors += edit_distance(r, h)
            total += len(r)
    return {
        "cer": 100.0 * errors / max(total, 1),
        "errors": float(errors),
        "ref_tokens": float(total),
    }


def wer(ref_words: List[Sequence[str]], hyp_words: List[Sequence[str]]) -> Dict[str, float]:
    """Word error rate; words are hashed to ids then scored like CER."""
    refs_ids, hyps_ids = [], []
    for r, h in zip(ref_words, hyp_words):
        vocab: Dict[str, int] = {}
        def ids(ws):
            out = []
            for w in ws:
                if w not in vocab:
                    vocab[w] = len(vocab)
                out.append(vocab[w])
            return out
        refs_ids.append(ids(list(r)))
        hyps_ids.append(ids(list(h)))
    out = cer(refs_ids, hyps_ids)
    out["wer"] = out.pop("cer")
    return out
