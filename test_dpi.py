"""DPI evaluation from a checkpoint (reference /root/reference/
test_dpi.py:9-50)."""

from biomedkg_tpu import config as cfglib
from biomedkg_tpu.common import seed_everything
from biomedkg_tpu.training.kge_module import _parse_neg_ratio, load_kge_module
from biomedkg_tpu.training.trainer import Trainer


@cfglib.main(config_path="configs", config_name="dpi")
def main(cfg):
    seed_everything(cfg.seed)

    data_module = cfglib.instantiate(
        cfg.data, gcl_model=cfg.gcl_model,
        gcl_fuse_method=cfg.gcl_fuse_method, seed=cfg.seed)
    data_module.setup(stage="split")

    print("=" * 20)
    print(f"Load from checkpoint: {cfg.pretrained_path}")
    print("=" * 20)

    model, params = load_kge_module(cfg.pretrained_path)
    model.neg_ratio = _parse_neg_ratio(cfg.neg_ratio)
    model.filter_negatives = bool(cfg.get("filter_neg", False))
    model.edge_mapping = data_module.edge_map_index

    # device-resident feature table: batches carry node ids only
    if data_module.graph.x is not None:
        data_module.device_features = True
        model.set_feature_table(data_module.graph.x)

    if model.hparams["encoder_name"] == "rgcn":
        data_module.edge_layout = "dst"   # Pallas sorted-segment aggregation
        model.edge_layout = "dst"


    print("=" * 20)
    print(f"Neg Ratio: {model.neg_ratio}")
    print("=" * 20)

    trainer = Trainer(deterministic=True, devices=cfg.devices,
                      log_every_n_steps=10)
    trainer.test(model,
                 dataloaders=data_module.test_dataloader(loader_type="saint"),
                 params=params)

    # cold-start eval when data.unseen_node_ratio > 0 (data/inductive.py)
    from biomedkg_tpu.eval.inductive import run_entrypoint_inductive_eval

    run_entrypoint_inductive_eval(model, trainer, data_module, cfg)


if __name__ == "__main__":
    main()
