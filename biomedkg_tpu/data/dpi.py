"""DrugBank drug-protein-interaction dataset loader.

Parity with /root/reference/biomedkg/data/dataset/dpi.py:8-17 (csv +
dropna); synthetic DTI fallback when the benchmark csv is absent.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import pandas as pd

from .synthetic import synthetic_dpi
from .triplet import TripletGraph


_DPI_COLUMNS = {"x_type", "x_name", "y_type", "y_name", "relation"}


class DPI(TripletGraph):
    def __init__(self, data_dir: str, encoder: Optional[Callable] = None):
        from .primekg import user_supplied_csv

        user = user_supplied_csv("BIOMEDKG_DPI_CSV", _DPI_COLUMNS)
        if user:
            print(f"[biomedkg_tpu] DPI csv from BIOMEDKG_DPI_CSV={user}")
            df = pd.read_csv(user)
        elif os.path.exists(data_dir):
            df = pd.read_csv(data_dir)
        else:
            print("[biomedkg_tpu] DPI benchmark csv unavailable; "
                  "falling back to the synthetic DTI graph.")
            df = synthetic_dpi(seed=43)
        df = df.dropna()
        super().__init__(df=df, encoder=encoder)
