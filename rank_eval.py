"""Filtered-ranking evaluation entry point (north-star protocol).

Computes filtered MRR / Hits@{1,3,10} for a trained KGE checkpoint over
the full graph — the standard KGE protocol the reference never implements
(BASELINE.md; its test protocol is binary classification vs sampled
negatives). Usage mirrors test_kge.py:

    python rank_eval.py pretrained_path=ckpt/kge/exp/best.ckpt
"""

import numpy as np

from biomedkg_tpu import config as cfglib
from biomedkg_tpu.common import seed_everything
from biomedkg_tpu.eval.ranking import filtered_ranking_metrics
from biomedkg_tpu.sampling.loaders import FullGraphLoader
from biomedkg_tpu.training.kge_module import load_kge_module


@cfglib.main(config_path="configs", config_name="kge")
def main(cfg):
    seed_everything(cfg.seed)

    data_module = cfglib.instantiate(
        cfg.data, gcl_model=cfg.gcl_model,
        gcl_fuse_method=cfg.gcl_fuse_method, seed=cfg.seed)
    data_module.setup(stage="split")

    print(f"Load from checkpoint: {cfg.pretrained_path}")
    module, params = load_kge_module(cfg.pretrained_path)

    # full-graph embeddings from the train+val message-passing structure
    batch = FullGraphLoader(data_module.test_data.graph).batch()
    z = np.asarray(module.encode(params, batch))

    def triples(split):
        ei, et = split.label_edge_index, split.label_edge_type
        return np.stack([ei[0], et, ei[1]], axis=1)

    test_triples = triples(data_module.test_data)
    all_triples = np.concatenate([
        triples(data_module.train_data),
        triples(data_module.val_data),
        test_triples])

    metrics = filtered_ranking_metrics(
        module.model.decoder, params["model"]["decoder"],
        z[:data_module.graph.num_nodes], test_triples, all_triples)

    print("filtered-ranking metrics:")
    for k, v in metrics.items():
        print(f"  {k}: {v:.6f}")
    return metrics


if __name__ == "__main__":
    main()
