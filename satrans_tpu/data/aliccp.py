"""AliCCP dataset: preprocessing + reader.

Reimplements the reference's offline pipeline (aliccp_dataset_processing.py)
and reader (utils.py:266-278 ``get_aliccp_ctr_df``):

* raw feature ids are global; each field is remapped to 1-based per-field ids
  by subtracting ``MIN_V[field] - 1`` and clamping negatives to 0
  (aliccp_dataset_processing.py:158-169)
* per-field vocab sizes are pinned by ``DATA_MAX``
  (aliccp_dataset_processing.py:179 == reference main.py:124-128)
* user behavior-history fields ('109_14' etc.) become top-k id lists per user,
  0-padded (aliccp_dataset_processing.py:96-111, 211-243)
* output schema: ``alicpp.h5`` with per-column int arrays under
  ``ctr_train/`` and ``ctr_test/``; history columns are stored as
  ``[N, k]`` arrays named ``{col}_{k}`` (the reader's contract,
  utils.py:273-276)

The driver CSVs (``sample_skeleton_{train,test}.csv``) have one row per
impression with columns click, purchase, and the 19 feature fields.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from . import io

LABELS = ["click", "purchase"]

SPARSE_FEATURES = ["101", "121", "122", "124", "125", "126", "127", "128",
                   "129", "205", "206", "207", "210", "216", "508", "509",
                   "702", "853", "301"]

HISTORY_COLUMNS = ["109_14", "110_14", "150_14", "127_14"]

# Global-id offset per field (aliccp_dataset_processing.py:158).
MIN_V = {"click": 1, "purchase": 1, "101": 1, "121": 3438658, "122": 3438755,
         "124": 3438768, "125": 3438770, "126": 3438777, "127": 3438780,
         "128": 3864885, "129": 3864887, "205": 3964447, "206": 8313062,
         "207": 8322055, "210": 9017179, "216": 9116785, "508": 9351668,
         "509": 9359853, "702": 9832207, "853": 10000020, "301": 9351665}

# Per-field max remapped id (aliccp_dataset_processing.py:179,
# main.py:124-128); embedding vocab = DATA_MAX + 2.
DATA_MAX = {"101": 444861, "121": 97, "122": 13, "124": 2, "125": 7,
            "126": 3, "127": 3, "128": 2, "129": 4, "205": 4348615,
            "206": 8993, "207": 695124, "210": 99606, "216": 234880,
            "508": 8185, "509": 472354, "702": 167813, "853": 91358,
            "301": 3, "10914": 12523, "11014": 2981271, "15014": 99555,
            "12714": 426101}


def normalize_ids(df: pd.DataFrame) -> pd.DataFrame:
    """Remap global ids to 1-based per-field ids; negatives -> 0
    (aliccp_dataset_processing.py:161-169)."""
    min_v = pd.Series({c: MIN_V[c] for c in df.columns})
    out = (df - (min_v - 1)).astype(np.int32)
    out[out < 0] = 0
    return out


def topk_edges(uids, fids, scores, k: int) -> pd.DataFrame:
    """Per-user top-k behavior ids by score, ties broken by input order
    (aliccp_dataset_processing.py:96-111)."""
    edges = pd.DataFrame({"uid": uids, "fid": fids, "score": scores})
    edges = edges.drop_duplicates()
    edges = edges.sort_values(by=["uid", "score"], ascending=(True, False))
    return edges.groupby("uid").head(k)


def history_feature_frame(edges: pd.DataFrame, k: int, col: str) -> pd.DataFrame:
    """uid -> 0-padded tuple of its top-k ids
    (aliccp_dataset_processing.py:220-222)."""
    df = edges[["uid", "fid"]].copy()
    agg = df.groupby("uid")["fid"].aggregate(
        lambda x: tuple(list(x)[:k] + [0] * max(0, k - len(x))))
    return agg.rename(col).reset_index().rename(columns={"uid": "101"})


def build_h5(train_df: pd.DataFrame, test_df: pd.DataFrame, h5_path: str,
             history: dict[str, pd.DataFrame] | None = None, k: int = 3):
    """Write the ``alicpp.h5`` schema (per-column arrays under
    ``ctr_train/`` / ``ctr_test/``, aliccp_dataset_processing.py:237-242)."""
    for name, df in (("train", train_df), ("test", test_df)):
        cols: dict[str, np.ndarray] = {}
        for col in df.columns:
            cols[col] = df[col].values
        if history:
            for hcol, hist_df in history.items():
                merged = df[["101"]].merge(hist_df, on="101", how="left")
                vals = merged[hcol].apply(
                    lambda x: tuple([0] * k) if not isinstance(x, tuple) else x)
                # normalize '109_14' -> '10914' like the reference
                # (aliccp_dataset_processing.py:217 col.replace('_','')), so
                # writer keys always match the reader's `{col}_{k}` contract
                key = hcol.replace("_", "")
                cols[f"{key}_{k}"] = np.array(list(vals), dtype=np.int32)
        io.save_dict_h5(h5_path, cols, group=f"ctr_{name}")


def preprocess(train_csv: str, test_csv: str, h5_path: str):
    """Full offline pipeline from normalized-id CSVs."""
    train_df = normalize_ids(pd.read_csv(train_csv, dtype=np.int32))
    test_df = normalize_ids(pd.read_csv(test_csv, dtype=np.int32))
    build_h5(train_df, test_df, h5_path)
    return train_df, test_df


def load_split(h5_path: str, split: str, cols: list[str], k: int = 3
               ) -> dict[str, np.ndarray]:
    """Reader matching ``get_aliccp_ctr_df`` (utils.py:266-278): history
    columns resolve to their ``{col}_{k}`` dataset."""
    hist_keys = {c.replace("_", "") for c in HISTORY_COLUMNS}
    resolved = [f"{c.replace('_', '')}_{k}"
                if c.replace("_", "") in hist_keys else c for c in cols]
    data = io.load_h5_dict(h5_path, group=split, cols=resolved)
    return {orig: data[res] for orig, res in zip(cols, resolved)}
