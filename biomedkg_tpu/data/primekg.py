"""PrimeKG dataset loader.

Parity with /root/reference/biomedkg/data/dataset/primekg.py:9-38:
TDC resource if available, else a local ``kg.csv`` (the reference wgets it
from Harvard Dataverse on miss — attempted here too when the environment has
egress), with both endpoint node types filtered to the requested list.
When neither source exists (air-gapped CI), a structurally-faithful
synthetic PrimeKG-schema graph is generated and a warning printed.
"""

from __future__ import annotations

import hashlib
import os
import urllib.request
from typing import Callable, List, Optional

import pandas as pd

from .synthetic import synthetic_triplets
from .triplet import TripletGraph

PRIMEKG_URL = "https://dataverse.harvard.edu/api/access/datafile/6180620"
# columns TripletBase consumes (_base.py:23-87); a download that parses but
# lacks these is corrupt/truncated and is discarded rather than cached
_REQUIRED_COLUMNS = {"x_type", "x_name", "y_type", "y_name",
                     "relation", "display_relation"}


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def user_supplied_csv(env_key: str,
                      required_columns=frozenset()) -> Optional[str]:
    """Day-one real-data on-ramp (round-2 VERDICT #8): when egress exists
    nowhere near the training box, a user drops the real csv anywhere and
    points ``$<env_key>`` at it; ``$<env_key>_SHA256`` (optional)
    validates integrity before anything trains on it. Schema is checked
    against the columns the loader consumes — a wrong file fails loudly,
    not as silent garbage."""
    path = os.environ.get(env_key)
    if not path:
        return None
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"{env_key}={path!r} does not exist")
    want = os.environ.get(env_key + "_SHA256")
    if want:
        got = _sha256(path)
        if got.lower() != want.lower():
            raise ValueError(
                f"{env_key} checksum mismatch: file {got}, "
                f"expected {want}")
    header = set(pd.read_csv(path, nrows=0).columns)
    missing = set(required_columns) - header
    if missing:
        raise ValueError(
            f"{env_key}={path!r} lacks required columns {sorted(missing)}; "
            f"found {sorted(header)}")
    return path


def _download_csv(csv_path: str) -> bool:
    """Fetch kg.csv without a shell (no injection surface) and validate
    the schema before accepting it into the cache. Atomic: downloads to
    a .part sibling and renames only after validation, so a kill
    mid-download can't leave a truncated kg.csv that later runs silently
    train on. A socket timeout bounds firewalled environments that DROP
    packets instead of rejecting them (urlretrieve would hang forever
    and the synthetic fallback would never trigger)."""
    import socket

    part = csv_path + ".part"
    old_timeout = socket.getdefaulttimeout()
    try:
        socket.setdefaulttimeout(30)
        urllib.request.urlretrieve(PRIMEKG_URL, part)  # nosec B310
        if os.path.getsize(part) == 0:
            return False
        header = set(pd.read_csv(part, nrows=0).columns)
        if not _REQUIRED_COLUMNS <= header:
            return False
        os.replace(part, csv_path)
        return True
    except Exception:
        return False
    finally:
        socket.setdefaulttimeout(old_timeout)
        if os.path.exists(part):
            try:
                os.remove(part)
            except OSError:
                pass


def _load_dataframe(data_dir: str) -> pd.DataFrame:
    user = user_supplied_csv("BIOMEDKG_KG_CSV", _REQUIRED_COLUMNS)
    if user:
        print(f"[biomedkg_tpu] PrimeKG csv from BIOMEDKG_KG_CSV={user}")
        return pd.read_csv(user, low_memory=False)
    try:
        from tdc.resource import PrimeKG as TDCPrimeKG  # optional dep

        return TDCPrimeKG(path=data_dir).df
    except Exception as e:
        # not just ImportError: with tdc INSTALLED but no egress, its
        # dataverse download raises network errors — fall through to the
        # local kg.csv / synthetic fallback instead of crashing
        if not isinstance(e, (ModuleNotFoundError, ImportError)):
            print(f"[biomedkg_tpu] TDC PrimeKG load failed "
                  f"({type(e).__name__}); trying kg.csv / synthetic.")

    csv_path = os.path.join(data_dir, "kg.csv")
    if not os.path.exists(csv_path):
        os.makedirs(data_dir, exist_ok=True)
        if not _download_csv(csv_path):
            if os.path.exists(csv_path):
                os.remove(csv_path)
            print("[biomedkg_tpu] PrimeKG csv unavailable (no egress); "
                  "falling back to the synthetic PrimeKG-schema graph.")
            if os.environ.get("BIOMEDKG_SYNTHETIC_SCALE") == "primekg":
                # full PrimeKG++-scale synthetic graph (node/edge counts of
                # the real dataset filtered to gene/drug/disease)
                return synthetic_triplets(num_gene=27000, num_drug=8000,
                                          num_disease=17000,
                                          num_edges=1_300_000, seed=42)
            return synthetic_triplets(seed=42)
    # validate the CACHED file too (pre-atomic-download truncations or a
    # hand-copied wrong csv must fail loudly, not train on garbage)
    header = set(pd.read_csv(csv_path, nrows=0).columns)
    if not _REQUIRED_COLUMNS <= header:
        raise ValueError(
            f"cached {csv_path} lacks required columns "
            f"{sorted(_REQUIRED_COLUMNS - header)} — delete it to "
            "re-download or set BIOMEDKG_KG_CSV")
    return pd.read_csv(csv_path, low_memory=False)


class PrimeKG(TripletGraph):
    def __init__(self, data_dir: str, node_type: Optional[List[str]] = None,
                 encoder: Optional[Callable] = None):
        df = _load_dataframe(data_dir)
        if node_type:
            node_type = list(node_type)
            df = df[df["x_type"].isin(node_type)
                    & df["y_type"].isin(node_type)]
        super().__init__(df=df, encoder=encoder)
