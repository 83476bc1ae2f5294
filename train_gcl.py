"""GCL contrastive pretraining per node type (reference /root/reference/
train_gcl.py:15-126): DGI/GRACE/GGD over NeighborLoader batches, top-1
checkpoint + EarlyStopping(patience=5)."""

import os
import time

from biomedkg_tpu import config as cfglib
from biomedkg_tpu.common import seed_everything
from biomedkg_tpu.training.checkpoint import EarlyStopping, ModelCheckpoint
from biomedkg_tpu.training.gcl_module import create_gcl_model
from biomedkg_tpu.training.logger import MetricsLogger
from biomedkg_tpu.training.trainer import Trainer


@cfglib.main(config_path="configs", config_name="gcl")
def main(cfg):
    seed_everything(cfg.seed)

    log_name = (f"{cfg.model.model_name}_{cfg.model.fuse_method}"
                f"_{cfg.data.node_init_method}_{int(time.time())}")
    ckpt_dir = os.path.join(cfg.ckpt_dir, "gcl", str(cfg.data.node_type),
                            log_name)
    log_dir = os.path.join(cfg.log_dir, "gcl", str(cfg.data.node_type),
                           log_name)

    if isinstance(cfg.data.node_type, list) and len(cfg.data.node_type) > 1:
        raise ValueError("Please select only one node type")

    # node-type normalization: "gene" → ["gene/protein"]
    # (reference train_gcl.py:49-55). Unwrap a single-element list FIRST —
    # str(["drug"]) would double-wrap to [["drug"]] and silently match
    # zero rows downstream.
    nt = cfg.data.node_type
    if isinstance(nt, (list, tuple)):
        nt = nt[0]
    cfg.data.node_type = (["gene/protein"] if str(nt).startswith("gene")
                          else [nt])

    data_module = cfglib.instantiate(cfg.data, seed=cfg.seed)
    data_module.setup(stage="split")

    model = create_gcl_model(cfg=cfg.model, seed=cfg.seed)

    # device-resident feature table: batches carry node ids only
    if data_module.graph.x is not None:
        data_module.device_features = True
        model.set_feature_table(data_module.graph.x)

    # destination-sorted batches: the GCN aggregation runs on the Pallas
    # sorted segment-sum (no relation blocks needed in the GCL path)
    data_module.edge_layout = "dst"
    model.edge_layout = "dst"


    os.makedirs(ckpt_dir, exist_ok=True)
    os.makedirs(log_dir, exist_ok=True)

    checkpoint_callback = ModelCheckpoint(
        dirpath=ckpt_dir, monitor="val_loss", save_top_k=1, mode="min")
    early_stopping = EarlyStopping(monitor="val_loss", mode="min",
                                   patience=5)
    logger = MetricsLogger(
        save_dir=log_dir, experiment_name=log_name,
        project_name=f"BioMedKG-GCL-{cfg.data.node_type}")

    trainer = Trainer(
        max_epochs=cfg.epochs,
        check_val_every_n_epoch=cfg.val_every_epoch,
        gradient_clip_val=1.0,
        callbacks=[checkpoint_callback, early_stopping],
        logger=logger,
        fast_dev_run=cfg.debug,
        log_every_n_steps=10,
        deterministic=True,
        devices=cfg.devices,
        steps_per_execution=cfg.get("steps_per_execution", 1))

    trainer.fit(
        model,
        train_dataloaders=data_module.train_dataloader(
            loader_type="neighbor"),
        val_dataloaders=data_module.val_dataloader(loader_type="neighbor"))

    trainer.test(
        model,
        dataloaders=data_module.test_dataloader(),
        ckpt_path=None if cfg.debug else "best")


if __name__ == "__main__":
    main()
