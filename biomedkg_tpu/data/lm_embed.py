"""Stage-A language-model node-attribute embedding.

Parity with /root/reference/biomedkg/data/embed.py:9-50: HF
AutoTokenizer/AutoModel (trust_remote_code, BertConfig path for DNA models),
512-token truncation, CLS vector output. This is a one-time offline
preprocessing stage whose output lands in a pickle cache — per SURVEY §2.9
it is *not* a TPU kernel target, so it runs on the baked-in torch-CPU HF
stack (or any available accelerator) and is import-gated for air-gapped CI.
"""

from __future__ import annotations

from typing import List

import numpy as np


class NodeEmbedding:
    def __init__(self, model_name_or_path: str, batch_size: int = 32):
        import torch  # gated: only needed for Stage-A preprocessing
        from transformers import AutoModel, AutoTokenizer, BertConfig

        self._torch = torch
        self.device = "cuda" if torch.cuda.is_available() else "cpu"
        self.tokenizer = AutoTokenizer.from_pretrained(
            model_name_or_path, trust_remote_code=True)
        if "DNA" in model_name_or_path:
            config = BertConfig.from_pretrained(model_name_or_path,
                                                local_files_only=True)
            self.model = AutoModel.from_pretrained(
                model_name_or_path, config=config).to(self.device)
        else:
            self.model = AutoModel.from_pretrained(
                model_name_or_path, trust_remote_code=True).to(self.device)
        self.model.eval()

    def __call__(self, input_lst: List[str]) -> np.ndarray:
        torch = self._torch
        tokens = self.tokenizer(
            input_lst, return_tensors="pt", padding=True, truncation=True,
            max_length=512).to(self.device)
        with torch.no_grad():
            out = self.model(**tokens)
        hidden = out[0] if isinstance(out, tuple) else out.last_hidden_state
        cls = hidden[:, 0, :]
        return cls.detach().cpu().numpy()
