"""Interactive KGE scoring CLI (serving surface).

    python serve.py pretrained_path=ckpt/kge/exp/best.ckpt

then on stdin (or piped):
    score <head_name> <relation_name> <tail_name>
    topk <head_name> <relation_name> [k]
    quit
"""

import sys

from biomedkg_tpu import config as cfglib
from biomedkg_tpu.common import seed_everything
from biomedkg_tpu.serving import KGEScorer


@cfglib.main(config_path="configs", config_name="kge")
def main(cfg):
    seed_everything(cfg.seed)
    data_module = cfglib.instantiate(
        cfg.data, gcl_model=cfg.gcl_model,
        gcl_fuse_method=cfg.gcl_fuse_method, seed=cfg.seed)
    scorer = KGEScorer(cfg.pretrained_path, data_module)
    print("ready. commands: score <h> <r> <t> | topk <h> <r> [k] | quit",
          flush=True)
    for line in sys.stdin:
        parts = line.strip().split()
        if not parts:
            continue
        try:
            if parts[0] == "quit":
                break
            if parts[0] == "score" and len(parts) == 4:
                print(f"{scorer.score(parts[1], parts[2], parts[3]):.6f}",
                      flush=True)
            elif parts[0] == "topk" and len(parts) >= 3:
                k = int(parts[3]) if len(parts) > 3 else 10
                for name, p in scorer.topk_tails(parts[1], parts[2], k):
                    print(f"  {p:.6f}  {name}", flush=True)
            else:
                print("unrecognized command", flush=True)
        except (KeyError, ValueError) as e:
            # bad names, bad k, non-integer k — report, keep serving
            print(f"error: {e}", flush=True)


if __name__ == "__main__":
    main()
