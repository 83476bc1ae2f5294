"""Stage-A language-model node-attribute embedding.

Parity with /root/reference/biomedkg/data/embed.py:9-50: HF
AutoTokenizer/AutoModel (trust_remote_code, BertConfig path for DNA
models), 512-token truncation, CLS vector output. Stage A is a one-time
offline preprocessing stage whose output lands in a pickle cache.

Two backends (``BIOMEDKG_LM_BACKEND`` = flax | torch | auto):

  * ``flax`` — the TPU-native path (ROADMAP #8): FlaxAutoModel forward
    under ``jax.jit`` with STATIC shapes (sequence length bucketed to
    multiples of 128 tokens, row count padded to ``batch_size``), so the
    whole Stage-A sweep runs as a handful of compiled MXU programs on
    the chip instead of the torch-CPU loop.
  * ``torch`` — the reference-faithful fallback; also the only option
    for trust_remote_code architectures with no flax port (MoLFormer).
  * ``auto`` (default) — try flax, fall back to torch.
"""

from __future__ import annotations

import os
from typing import List

import numpy as np


def _bucket(n: int, m: int) -> int:
    return max(m, ((n + m - 1) // m) * m)


class NodeEmbedding:
    def __init__(self, model_name_or_path: str, batch_size: int = 32,
                 backend: str | None = None):
        backend = backend or os.environ.get("BIOMEDKG_LM_BACKEND", "auto")
        assert backend in ("flax", "torch", "auto"), backend
        self.batch_size = batch_size
        from transformers import AutoTokenizer

        self.tokenizer = AutoTokenizer.from_pretrained(
            model_name_or_path, trust_remote_code=True)
        self.backend = None
        if backend in ("flax", "auto"):
            try:
                self._init_flax(model_name_or_path)
                self.backend = "flax"
            except Exception as e:
                if backend == "flax":
                    raise
                import warnings

                warnings.warn(
                    f"flax backend unavailable for "
                    f"{model_name_or_path!r} ({type(e).__name__}: {e}); "
                    "falling back to the torch-CPU path (orders of "
                    "magnitude slower for Stage-A sweeps)", stacklevel=2)
        if self.backend is None:
            self._init_torch(model_name_or_path)
            self.backend = "torch"

    # -- flax / TPU path ----------------------------------------------------

    def _init_flax(self, model_name_or_path: str):
        import jax
        from transformers import BertConfig, FlaxAutoModel

        kwargs = {}
        if "DNA" in model_name_or_path:
            kwargs["config"] = BertConfig.from_pretrained(
                model_name_or_path, local_files_only=True)
        try:
            self.model = FlaxAutoModel.from_pretrained(
                model_name_or_path, **kwargs)
        except (OSError, EnvironmentError):
            # torch-format checkpoint (the common case): convert weights
            self.model = FlaxAutoModel.from_pretrained(
                model_name_or_path, from_pt=True, **kwargs)
        model = self.model

        @jax.jit
        def fwd(params, **tokens):
            out = model(**tokens, params=params, train=False)
            hidden = (out[0] if isinstance(out, tuple)
                      else out.last_hidden_state)
            return hidden[:, 0, :]

        self._jfwd = fwd

    def _call_flax(self, input_lst: List[str]) -> np.ndarray:
        tokens = self.tokenizer(input_lst, return_tensors="np",
                                padding=True, truncation=True,
                                max_length=512)
        n, L = tokens["input_ids"].shape
        # static envelope: seq length bucketed to 128s, rows to batch_size
        # (≤ 4·ceil(max_nodes/batch_size) distinct compiles per model)
        Lp = min(_bucket(L, 128), 512)
        npad = _bucket(n, self.batch_size)
        pad_id = self.tokenizer.pad_token_id or 0
        arrs = {}
        for k, v in tokens.items():
            fill = pad_id if k == "input_ids" else 0
            arrs[k] = np.pad(v, ((0, npad - n), (0, Lp - L)),
                             constant_values=fill)
        cls = self._jfwd(self.model.params, **arrs)
        return np.asarray(cls[:n]).astype(np.float32)

    # -- torch fallback -----------------------------------------------------

    def _init_torch(self, model_name_or_path: str):
        import torch  # gated: only needed for Stage-A preprocessing
        from transformers import AutoModel, BertConfig

        self._torch = torch
        self.device = "cuda" if torch.cuda.is_available() else "cpu"
        if "DNA" in model_name_or_path:
            config = BertConfig.from_pretrained(model_name_or_path,
                                                local_files_only=True)
            self.model = AutoModel.from_pretrained(
                model_name_or_path, config=config).to(self.device)
        else:
            self.model = AutoModel.from_pretrained(
                model_name_or_path, trust_remote_code=True).to(self.device)
        self.model.eval()

    def _call_torch(self, input_lst: List[str]) -> np.ndarray:
        torch = self._torch
        tokens = self.tokenizer(
            input_lst, return_tensors="pt", padding=True, truncation=True,
            max_length=512).to(self.device)
        with torch.no_grad():
            out = self.model(**tokens)
        hidden = out[0] if isinstance(out, tuple) else out.last_hidden_state
        cls = hidden[:, 0, :]
        return cls.detach().cpu().numpy()

    def __call__(self, input_lst: List[str]) -> np.ndarray:
        if self.backend == "flax":
            return self._call_flax(input_lst)
        return self._call_torch(input_lst)
