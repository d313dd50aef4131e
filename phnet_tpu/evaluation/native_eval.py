"""ctypes wrapper for the native C++ CULane evaluator.

Builds/loads ``native/libculane_eval.so`` (OpenMP over frames — the native
equivalent of the reference's ``culane_evaluator`` binary invoked via
``os.system`` from ``evaluate_iou.py:55-58``; here it is in-process through
the C ABI, no subprocess or temp-file plumbing).
"""

from __future__ import annotations

import ctypes
import glob
import os
import subprocess
from typing import Dict, List, Optional, Sequence, Tuple

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libculane_eval.so")
_lib = None


def build(force: bool = False) -> bool:
    if os.path.exists(_SO_PATH) and not force:
        return True
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
        return os.path.exists(_SO_PATH)
    except Exception:
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO_PATH) and not build():
        return None
    lib = ctypes.CDLL(_SO_PATH)
    lib.culane_evaluate_files.restype = ctypes.c_int
    lib.culane_evaluate_files.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_double,
        ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_long),
        ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_long),
    ]
    lib.culane_evaluate_files_v2.restype = ctypes.c_int
    lib.culane_evaluate_files_v2.argtypes = (
        lib.culane_evaluate_files.argtypes + [ctypes.POINTER(ctypes.c_double)])
    _lib = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def evaluate_pairs(
    pairs: Sequence[Tuple[str, str]], img_w: int, img_h: int,
    lane_width: int = 30, iou_thr: float = 0.5,
) -> Dict[str, float]:
    lib = _load()
    assert lib is not None, "native evaluator not built"
    n = len(pairs)
    pred_arr = (ctypes.c_char_p * n)(*[p.encode() for p, _ in pairs])
    anno_arr = (ctypes.c_char_p * n)(*[a.encode() for _, a in pairs])
    tp = ctypes.c_long()
    fp = ctypes.c_long()
    fn = ctypes.c_long()
    iou_sum = ctypes.c_double()
    n_pred = ctypes.c_long()
    frame_miou_sum = ctypes.c_double()
    lib.culane_evaluate_files_v2(
        pred_arr, anno_arr, n, img_w, img_h, lane_width, iou_thr,
        ctypes.byref(tp), ctypes.byref(fp), ctypes.byref(fn),
        ctypes.byref(iou_sum), ctypes.byref(n_pred),
        ctypes.byref(frame_miou_sum),
    )
    tp, fp, fn = tp.value, fp.value, fn.value
    p = tp / (tp + fp) if tp + fp else 0.0
    r = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * p * r / (p + r) if p + r else 0.0
    miou = iou_sum.value / n_pred.value if n_pred.value else 0.0
    # the official binary's aggregate: mean of per-frame mious
    # (evaluate.cpp:170-187); "miou" keeps the historic matched-IoU /
    # n_predictions weighting for comparability with earlier rounds
    miou_official = frame_miou_sum.value / n if n else 0.0
    return {"TP": tp, "FP": fp, "FN": fn, "Precision": p, "Recall": r,
            "F1": f1, "miou": miou, "miou_official": miou_official}


def native_eval(pred_dir: str, anno_dir: str, img_w: int, img_h: int,
                lane_width: int = 30, iou_thr: float = 0.5) -> Dict[str, float]:
    pairs = []
    for af in sorted(glob.glob(os.path.join(anno_dir, "*", "*.lines.txt"))):
        vid = os.path.basename(os.path.dirname(af))
        pf = os.path.join(pred_dir, vid, os.path.basename(af))
        pairs.append((pf, af))
    return evaluate_pairs(pairs, img_w, img_h, lane_width, iou_thr)
