"""CLI: import a reference torch checkpoint into an orbax train state.

Translates a ``TF_RNN_Past_State.state_dict()`` .pt file (the reference's
shipped model-with/without-dip9and10.pt format) into this framework's
parameter pytree and saves it as an orbax checkpoint usable by the runner,
the evaluator, and as a warm start for training.

  python -m tip_tpu.cli.import_torch_ckpt --pt output/model-without-dip9and10.pt \
      --out output/model-imported --five_sbp --with_acc_sum
"""

import argparse


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--pt", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--five_sbp", action="store_true")
    ap.add_argument("--with_acc_sum", action="store_true")
    args = ap.parse_args()

    import torch
    from tip_tpu import constants as cst
    from tip_tpu.models import tip_model as M
    from tip_tpu.train import train as train_lib

    n_sbps = 5 if args.five_sbp else 2
    cfg = M.ModelConfig(size_s=cst.state_dim(n_sbps),
                        with_acc_sum=args.with_acc_sum)
    sd = torch.load(args.pt, map_location="cpu")
    params = M.params_from_torch_state_dict(sd, cfg)
    print(f"imported {M.param_count(params):,} parameters")

    tcfg = train_lib.TrainConfig(model=cfg, n_sbps=n_sbps)
    state = train_lib.init_state(tcfg)
    state = state.replace(params=params)
    train_lib.save_checkpoint(args.out, state, 0)
    print("saved orbax checkpoint to", args.out)


if __name__ == "__main__":
    main()
