"""KGE link-prediction training on PrimeKG++ (reference /root/reference/
train_kge.py:15-102): GraphSAINT loaders, top-3 val_loss checkpoints +
save_last, gradient clip 1.0, test on the best checkpoint. CLI overrides
use the same dotted vocabulary so the reference's scripts/kge.sh works
unchanged."""

import os
import time

from biomedkg_tpu import config as cfglib
from biomedkg_tpu.common import seed_everything
from biomedkg_tpu.training.checkpoint import ModelCheckpoint
from biomedkg_tpu.training.kge_module import KGEModule
from biomedkg_tpu.training.logger import MetricsLogger
from biomedkg_tpu.training.trainer import Trainer


@cfglib.main(config_path="configs", config_name="kge")
def main(cfg):
    seed_everything(cfg.seed)

    data_module = cfglib.instantiate(
        cfg.data, gcl_model=cfg.gcl_model,
        gcl_fuse_method=cfg.gcl_fuse_method, seed=cfg.seed)
    data_module.setup(stage="split")

    model = KGEModule(
        **cfg.model,
        num_relation=data_module.data.num_edge_types,
        neg_ratio=cfg.neg_ratio,
        node_init_method=cfg.data.node_init_method,
        seed=cfg.seed)
    model.edge_mapping = data_module.edge_map_index

    if cfg.get("typed_tables", False):
        # hetero-native typed-table mode (models/typed.py): per-type
        # feature tables + per-signature edge blocks; full-batch training
        # on the train split, or GraphSAINT sub-batches with
        # typed_loader=saint (sampling/typed_batch.py); parity with the
        # homogeneous path is gated in tests/test_typed.py
        from biomedkg_tpu.training.typed_train import (typed_full_train,
                                                       typed_saint_train)

        if cfg.get("typed_loader", "full") == "saint":
            typed_saint_train(model, data_module, cfg)
        else:
            typed_full_train(model, data_module, cfg)
        return

    # device-resident feature table: batches carry node ids only
    if data_module.graph.x is not None:
        data_module.device_features = True
        model.set_feature_table(data_module.graph.x)

    # destination-sorted batches: the RGCN aggregation scatter runs on the
    # Pallas sorted segment-sum (ops/pallas/segsum.py); RGAT needs
    # relation-sorted blocks for its grouped-GEMM
    if cfg.model.encoder_name == "rgcn":
        data_module.edge_layout = "dst"
        model.edge_layout = "dst"

    # occupancy-aware SAINT packing: saint_fill=0.92 tops up walk roots
    # per train batch until realized edges fill that fraction of the
    # static envelope (sampling/saint.py fill_target; PERF.md round-5)
    fill = cfg.get("saint_fill", None)
    if fill is not None and str(fill).lower() not in ("none", "null", ""):
        data_module.saint_fill_target = float(fill)


    exp_name = (f"{cfg.model.encoder_name}_{cfg.model.decoder_name}"
                f"_{cfg.data.node_init_method}")
    if cfg.data.node_init_method == "gcl":
        exp_name += f"_{cfg.gcl_model}_{cfg.gcl_fuse_method}"
    exp_name += str(int(time.time()))
    ckpt_dir = os.path.join(cfg.ckpt_dir, "kge", exp_name)
    log_dir = os.path.join(cfg.log_dir, "kge", exp_name)
    os.makedirs(ckpt_dir, exist_ok=True)
    os.makedirs(log_dir, exist_ok=True)

    checkpoint_callback = ModelCheckpoint(
        dirpath=ckpt_dir, monitor="val_loss", save_top_k=3, mode="min",
        save_last=True)
    logger = MetricsLogger(save_dir=log_dir, experiment_name=exp_name,
                           project_name="BioMedKG-KGE")

    trainer = Trainer(
        max_epochs=cfg.epochs,
        check_val_every_n_epoch=cfg.val_every_epoch,
        gradient_clip_val=1.0,
        callbacks=[checkpoint_callback],
        logger=logger,
        fast_dev_run=cfg.debug,
        log_every_n_steps=10,
        deterministic=True,
        devices=cfg.devices,
        steps_per_execution=cfg.get("steps_per_execution", 1))

    trainer.fit(
        model,
        train_dataloaders=data_module.train_dataloader(loader_type="saint"),
        val_dataloaders=data_module.val_dataloader(loader_type="saint"))

    trainer.test(
        model,
        dataloaders=data_module.test_dataloader(loader_type="saint"),
        ckpt_path=None if cfg.debug else "best")

    # cold-start eval when data.unseen_node_ratio > 0 (data/inductive.py)
    from biomedkg_tpu.eval.inductive import run_entrypoint_inductive_eval

    run_entrypoint_inductive_eval(model, trainer, data_module, cfg)


if __name__ == "__main__":
    main()
