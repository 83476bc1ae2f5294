"""DPI fine-tuning on DrugBank DTI (reference /root/reference/
train_dpi.py:15-110): optionally warm-starts from a pretrained KGE
checkpoint and pins every edge to PrimeKG's protein-drug relation id
(fix_edge_id = 1) so the pretrained relation embedding transfers."""

import os
import time

from biomedkg_tpu import config as cfglib
from biomedkg_tpu.common import seed_everything
from biomedkg_tpu.training.checkpoint import ModelCheckpoint
from biomedkg_tpu.training.kge_module import KGEModule, load_kge_module
from biomedkg_tpu.training.logger import MetricsLogger
from biomedkg_tpu.training.trainer import Trainer


@cfglib.main(config_path="configs", config_name="dpi")
def main(cfg):
    seed_everything(cfg.seed)

    data_module = cfglib.instantiate(
        cfg.data, gcl_model=cfg.gcl_model,
        gcl_fuse_method=cfg.gcl_fuse_method, seed=cfg.seed)
    data_module.setup(stage="split")

    import os

    pretrained_params = None
    pp = str(cfg.pretrained_path)
    # warm start for BOTH checkpoint backends this framework writes:
    # pickle .ckpt files AND orbax directories (suffix-only detection
    # silently trained from scratch for orbax paths)
    warm = pp.endswith(".ckpt") or os.path.isdir(pp)
    if pp and pp.lower() not in ("none", "null", "") and not warm:
        raise ValueError(
            f"pretrained_path={pp!r} is neither a .ckpt file nor an "
            "orbax checkpoint directory")
    if not warm:
        model = KGEModule(
            **cfg.model,
            num_relation=data_module.data.num_edge_types,
            neg_ratio=cfg.neg_ratio,
            node_init_method=cfg.data.node_init_method,
            seed=cfg.seed)
    else:
        from biomedkg_tpu.training.kge_module import _parse_neg_ratio

        model, pretrained_params = load_kge_module(cfg.pretrained_path)
        # In PrimeKG, 1 is the index of the protein-drug relationship
        # (reference train_dpi.py:33-35).
        model.fix_edge_id = 1
        model.neg_ratio = _parse_neg_ratio(cfg.neg_ratio)

    model.edge_mapping = data_module.edge_map_index

    # device-resident feature table: batches carry node ids only
    if data_module.graph.x is not None:
        data_module.device_features = True
        model.set_feature_table(data_module.graph.x)

    # destination-sorted batches: the RGCN aggregation scatter runs on the
    # Pallas sorted segment-sum (ops/pallas/segsum.py); RGAT needs
    # relation-sorted blocks for its grouped-GEMM. Keyed on the ACTUAL
    # encoder (a warm-started checkpoint may carry a different one).
    if model.hparams["encoder_name"] == "rgcn":
        data_module.edge_layout = "dst"
        model.edge_layout = "dst"


    exp_name = (f"{cfg.model.encoder_name}_{cfg.model.decoder_name}"
                f"_{cfg.data.node_init_method}")
    if cfg.data.node_init_method == "gcl":
        exp_name += f"{cfg.gcl_model}_{cfg.gcl_fuse_method}"
    exp_name += str(int(time.time()))
    ckpt_dir = os.path.join(cfg.ckpt_dir, "dpi", exp_name)
    log_dir = os.path.join(cfg.log_dir, "dpi", exp_name)
    os.makedirs(ckpt_dir, exist_ok=True)
    os.makedirs(log_dir, exist_ok=True)

    checkpoint_callback = ModelCheckpoint(
        dirpath=ckpt_dir, monitor="val_loss", save_top_k=3, mode="min",
        save_last=True)
    logger = MetricsLogger(save_dir=log_dir, experiment_name=exp_name,
                           project_name="BioMedKG-DPI")

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
        val_dataloaders=data_module.val_dataloader(loader_type="saint"),
        init_params=pretrained_params)

    trainer.test(
        model,
        dataloaders=data_module.test_dataloader(loader_type="saint"),
        ckpt_path=None if cfg.debug else "best")

    # cold-start eval when data.unseen_node_ratio > 0 (data/inductive.py):
    # the "unseen drug" DTI transfer scenario (reference train_dpi.py:24-36
    # is the warm-start mechanism; this measures it)
    from biomedkg_tpu.eval.inductive import run_entrypoint_inductive_eval

    run_entrypoint_inductive_eval(model, trainer, data_module, cfg)


if __name__ == "__main__":
    main()
