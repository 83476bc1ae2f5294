"""Node-feature encoders: Random / LM-multimodal / GCL / KGE.

Parity targets in /root/reference/biomedkg/data/node.py:

  * RandomEncode            (node.py:139-152)   — xavier-normal features
  * LMMultiModalsEncode     (node.py:18-136)    — Stage-A pickle cache
    ``data/embed/{config_stem}_lm.pickle`` mapping name → (M=2, 768);
    L2-normalized across the modality axis; xavier rows for NaN/missing
  * GCLEncode               (node.py:155-241)   — Stage-B pickle cache
    ``data/gcl_embed/{model}_{fuse}.pickle`` from a GCL checkpoint; the
    reference runs one NeighborLoader batch **per node** — here a single
    padded full-graph forward produces every node's embedding at once
  * KGEEncode               (node.py:244-330)   — Stage-C cache for ml_exp

All encoders expose ``__call__(list[str]) -> (N, ...) float32`` and a
``random_init_ratio`` attribute (printed by TripletGraph like the
reference's TripletBase, _base.py:57).
"""

from __future__ import annotations

import glob
import hashlib
import os
import pickle
from pathlib import Path
from typing import Dict, List

import numpy as np
import yaml


def xavier_normal_np(rng: np.random.Generator, shape) -> np.ndarray:
    """torch.nn.init.xavier_normal_ semantics on a 2D shape."""
    fan_out, fan_in = shape[0], shape[1]
    std = np.sqrt(2.0 / (fan_in + fan_out))
    return (std * rng.standard_normal(shape)).astype(np.float32)


class RandomEncode:
    def __init__(self, embed_dim: int = 768, seed: int = 42):
        self.embed_dim = embed_dim
        self.random_init_ratio = 1
        self._rng = np.random.default_rng(seed)

    def __call__(self, lst_node: List[str]) -> np.ndarray:
        return xavier_normal_np(self._rng, (len(lst_node), self.embed_dim))


class _PickleCacheEncode:
    """Shared cache-lookup behavior: hit → stored rows, miss → xavier rows."""

    artifact_path: str
    embed_dim: int
    miss_shape: tuple

    def _load_mapping(self) -> Dict[str, np.ndarray]:
        if not os.path.exists(self.artifact_path):
            self._build_cache()
        with open(self.artifact_path, "rb") as f:
            return pickle.load(f)

    def _build_cache(self):  # pragma: no cover - overridden
        raise NotImplementedError

    def __call__(self, lst_node: List[str]) -> np.ndarray:
        # stable digest (not Python's per-process salted hash) so cache-miss
        # fallback rows are identical across runs/processes
        digest = hashlib.sha256(
            "|".join(str(n) for n in lst_node[:3]).encode()).digest()
        rng = np.random.default_rng(int.from_bytes(digest[:4], "little"))
        rows, misses = [], 0
        for name in lst_node:
            emb = self.node_mapping.get(name)
            if emb is None:
                emb = xavier_normal_np(rng, self.miss_shape)
                misses += 1
            rows.append(np.asarray(emb, dtype=np.float32))
        self.random_init_ratio = misses / max(len(lst_node), 1)
        return np.stack(rows, axis=0)


class LMMultiModalsEncode(_PickleCacheEncode):
    def __init__(self, config_file: str, embed_dim: int = 768,
                 batch_size: int = 128):
        with open(config_file) as f:
            self.conf = yaml.safe_load(f)
        self.artifact_path = os.path.join(
            "data", "embed", f"{Path(config_file).stem}_lm.pickle")
        self.embed_dim = embed_dim
        self.batch_size = batch_size
        self.miss_shape = (2, embed_dim)
        self.node_mapping = self._load_mapping()
        self.random_init_ratio = 0

    def _build_cache(self):
        os.makedirs(os.path.dirname(self.artifact_path), exist_ok=True)
        node_mapping: Dict[str, np.ndarray] = {}
        for node_type, spec in self.conf.items():
            if isinstance(spec, dict) and spec.get("file_name") is None:
                for sub_spec in spec.values():
                    node_mapping.update(self._feature_dict(**sub_spec))
            else:
                node_mapping.update(self._feature_dict(**spec))
        with open(self.artifact_path, "wb") as f:
            pickle.dump(node_mapping, f, protocol=pickle.HIGHEST_PROTOCOL)

    def _feature_dict(self, file_name: str, idetifier_column: str,
                      modality_columns: List[str],
                      model_name_for_each_modality: List[str]):
        """Per-modality LM encoding with xavier rows for NaN values and
        L2 normalization across the modality axis (node.py:103-117)."""
        import pandas as pd

        from .lm_embed import NodeEmbedding

        df = pd.read_csv(file_name)
        df = df[[idetifier_column] + list(modality_columns)]
        df = df.drop_duplicates(keep="first")

        models = {m: NodeEmbedding(name) for m, name in
                  zip(modality_columns, model_name_for_each_modality)}
        rng = np.random.default_rng(0)
        out: Dict[str, np.ndarray] = {}
        for lo in range(0, len(df), self.batch_size):
            rows = df.iloc[lo:lo + self.batch_size]
            per_modality = []
            for modality in modality_columns:
                values = rows[modality].to_list()
                nan_mask = pd.isna(values)
                combined = np.empty((len(rows), self.embed_dim), np.float32)
                combined[nan_mask] = xavier_normal_np(
                    rng, (int(np.sum(nan_mask)), self.embed_dim))
                valid = [v for v, isnan in zip(values, nan_mask) if not isnan]
                if valid:
                    combined[~nan_mask] = models[modality](valid)
                per_modality.append(combined)
            stacked = np.stack(per_modality, axis=1)          # (B, M, D)
            norms = np.linalg.norm(stacked, axis=1, keepdims=True)
            normalized = stacked / np.maximum(norms, 1e-12)
            out.update(zip(rows[idetifier_column].to_list(),
                           list(normalized)))
        return out


class GCLEncode(_PickleCacheEncode):
    data_gcl = os.path.join("data", "gcl_embed")
    gcl_ckpt = os.path.join("ckpt", "gcl")

    def __init__(self, model_name: str, fuse_method: str, embed_dim: int):
        self.model_name = model_name
        self.fuse_method = fuse_method
        self.embed_dim = embed_dim
        self.miss_shape = (1, embed_dim)
        os.makedirs(self.data_gcl, exist_ok=True)
        self.artifact_path = os.path.join(
            self.data_gcl, f"{model_name}_{fuse_method}.pickle")
        self.node_mapping = self._load_mapping()
        self.random_init_ratio = 0

    def _build_cache(self):
        from ..training.gcl_module import load_gcl_module
        from ..data import modules as dm
        from ..sampling.loaders import FullGraphLoader

        if not os.path.exists(self.gcl_ckpt):
            raise FileNotFoundError(
                f"Can't find checkpoints from {self.gcl_ckpt}")

        node_mapping: Dict[str, np.ndarray] = {}
        for node_type in ["gene", "drug", "disease"]:
            pattern = (f"{self.gcl_ckpt}/{node_type}/{self.model_name}"
                       f"*{self.fuse_method}*lm*/*.ckpt")
            files = glob.glob(pattern)
            assert files, f"Can't find checkpoint with pattern {pattern}"
            module, params = load_gcl_module(files[0])

            full_type = "gene/protein" if node_type.startswith("gene") \
                else node_type
            data = dm.PrimeKGModule(
                data_dir="./data/primekg", embed_dim=768,
                node_type=[full_type], batch_size=128, val_ratio=0.2,
                test_ratio=0.2, node_init_method="lm",
                # Stage-B checkpoints were trained against whatever
                # modality config the run used; non-default runs (e.g.
                # scripts/pipeline_full.py) pass it through the env
                modality_config_path=os.environ.get(
                    "BIOMEDKG_MODALITY_CONFIG",
                    "configs/lm_modality/primekg_modality.yaml"))
            data.setup(stage="split")

            # One full-graph forward replaces the reference's
            # batch-per-node NeighborLoader export loop (node.py:229-238).
            batch = FullGraphLoader(data.primekg.graph).batch()
            z = np.asarray(module.encode(params, batch))
            for i, name in enumerate(data.primekg.node_list):
                node_mapping[name] = z[i:i + 1]

        with open(self.artifact_path, "wb") as f:
            pickle.dump(node_mapping, f, protocol=pickle.HIGHEST_PROTOCOL)


class KGEEncode(_PickleCacheEncode):
    def __init__(self, ckpt_path: str, node_init_method: str,
                 gcl_model: str, gcl_fuse_method: str, out_dim: int = 256):
        self.ckpt_path = ckpt_path
        self.node_init_method = node_init_method
        self.gcl_model = gcl_model
        self.gcl_fuse_method = gcl_fuse_method
        self.out_dim = out_dim
        self.embed_dim = out_dim
        self.miss_shape = (1, out_dim)

        save_dir = os.path.join("data", "kge_embed")
        os.makedirs(save_dir, exist_ok=True)
        # reference stem rule truncated at the FIRST '.' of the joined
        # path ("lr0.001/best.ckpt" and "lr0.01/best.ckpt" both → "lr0":
        # silent stale-cache reuse across experiments); strip only the
        # final extension instead and keep the rest of both components
        joined = "_".join(ckpt_path.split("/")[-2:])
        stem = joined.rsplit(".", 1)[0] if "." in joined else joined
        self.artifact_path = os.path.join(save_dir, stem)
        self.node_mapping = self._load_mapping()
        self.random_init_ratio = 0

    def _build_cache(self):
        from ..training.kge_module import load_kge_module
        from ..data import modules as dm
        from ..sampling.loaders import FullGraphLoader

        if not os.path.exists(self.ckpt_path):
            raise FileNotFoundError(self.ckpt_path)
        module, params = load_kge_module(self.ckpt_path)

        in_dim = 768 if self.node_init_method in ("random", "lm") else 256
        data = dm.PrimeKGModule(
            data_dir="./data/primekg", embed_dim=in_dim,
            node_type=["gene/protein", "drug", "disease"], batch_size=64,
            val_ratio=0.2, test_ratio=0.2,
            node_init_method=self.node_init_method,
            gcl_model=self.gcl_model,
            gcl_fuse_method=self.gcl_fuse_method)
        data.setup()

        batch = FullGraphLoader(data.primekg.graph).batch()
        z = np.asarray(module.encode(params, batch))
        node_mapping = {name: z[i:i + 1]
                        for i, name in enumerate(data.primekg.node_list)}
        with open(self.artifact_path, "wb") as f:
            pickle.dump(node_mapping, f, protocol=pickle.HIGHEST_PROTOCOL)
