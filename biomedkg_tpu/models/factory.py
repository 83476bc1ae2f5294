"""Model factories (reference /root/reference/biomedkg/factory.py:8-114).

Public name vocabulary is kept verbatim — including the reference's
misspelled ``"dismult"`` decoder key used throughout its configs/scripts
(configs/model/kge.yaml:5) — with ``"distmult"`` accepted as an alias and
``"rotate"`` added for the benchmark suite.
"""

from __future__ import annotations

from typing import Optional

import jax

from .decoders import ComplEx, DistMult, RotatE, TransE
from .encoders import RGAT, RGCN
from .fusion import AttentionFusion, ReDAF


class GAE:
    """Graph auto-encoder pairing: encode with a GNN, decode triplet scores.

    Plays the role of PyG's ``GAE(encoder, decoder)`` (factory.py:47-50) as a
    thin functional container.
    """

    def __init__(self, encoder, decoder):
        self.encoder = encoder
        self.decoder = decoder

    def init(self, rng) -> dict:
        r1, r2 = jax.random.split(rng)
        return {"encoder": self.encoder.init(r1),
                "decoder": self.decoder.init(r2)}

    def encode(self, params, x, edge_index, edge_type, edge_mask, block_rel,
               *, rng=None, training=False):
        return self.encoder.apply(params["encoder"], x, edge_index, edge_type,
                                  edge_mask, block_rel, rng=rng,
                                  training=training)

    def decode(self, params, z, head, tail, rel, **kw):
        return self.decoder.score(params["decoder"], z, head, tail, rel,
                                  **kw)


class FusionFactory:
    """Reference factory.py:8-15."""

    @staticmethod
    def create_fuser(method: Optional[str], embed_dim: int):
        if method == "attention":
            return AttentionFusion(embed_dim=embed_dim)
        if method == "redaf":
            return ReDAF(embed_dim=embed_dim)
        return None


class KGEModelFactory:
    """Reference factory.py:18-114."""

    @staticmethod
    def get_model(encoder_name: str, decoder_name: str, in_dim: int,
                  hidden_dim: int, out_dim: int, num_hidden_layers: int,
                  num_relation: int, num_heads: Optional[int] = None) -> GAE:
        encoder = KGEModelFactory._get_encoder(
            encoder_name=encoder_name, in_dim=in_dim, hidden_dim=hidden_dim,
            out_dim=out_dim, num_hidden_layers=num_hidden_layers,
            num_relation=num_relation, num_heads=num_heads)
        decoder = KGEModelFactory._get_decoder(
            decoder_name=decoder_name, num_relation=num_relation,
            hidden_channels=out_dim)
        return GAE(encoder=encoder, decoder=decoder)

    @staticmethod
    def _get_encoder(encoder_name, in_dim, hidden_dim, out_dim,
                     num_hidden_layers, num_relation, num_heads=None):
        if encoder_name == "rgcn":
            return RGCN(in_dim=in_dim, hidden_dim=hidden_dim, out_dim=out_dim,
                        num_hidden_layers=num_hidden_layers,
                        num_relations=num_relation)
        if encoder_name == "rgat":
            return RGAT(in_dim=in_dim, hidden_dim=hidden_dim, out_dim=out_dim,
                        num_hidden_layers=num_hidden_layers,
                        num_relations=num_relation,
                        num_heads=num_heads or 1)
        raise ValueError(f"Unknown encoder: {encoder_name!r}")

    @staticmethod
    def _get_decoder(decoder_name, num_relation, hidden_channels):
        if decoder_name == "transe":
            return TransE(num_relations=num_relation,
                          hidden_channels=hidden_channels)
        if decoder_name in ("dismult", "distmult"):
            return DistMult(num_relations=num_relation,
                            hidden_channels=hidden_channels)
        if decoder_name == "complex":
            return ComplEx(num_relations=num_relation,
                           hidden_channels=hidden_channels)
        if decoder_name == "rotate":
            return RotatE(num_relations=num_relation,
                          hidden_channels=hidden_channels)
        raise ValueError(f"Unknown decoder: {decoder_name!r}")


def create_kge_model(cfg) -> GAE:
    """Reference factory.py:104-114."""
    return KGEModelFactory.get_model(
        encoder_name=cfg.encoder_name, decoder_name=cfg.decoder_name,
        in_dim=cfg.in_dim, hidden_dim=cfg.hidden_dim, out_dim=cfg.out_dim,
        num_hidden_layers=cfg.num_hidden_layers,
        num_relation=cfg.num_relation, num_heads=cfg.num_heads)
