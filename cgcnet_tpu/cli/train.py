"""Training CLI — replaces the reference's train.py argparse driver
(train.py:299-435, parallel_train.sh).

Usage:
    python -m cgcnet_tpu.cli.train [--config cfg.json] [--synthetic]
        [section.key=value ...]

Examples:
    # canonical reference configuration on a synthetic dataset
    python -m cgcnet_tpu.cli.train --synthetic train.num_epochs=2

    # real protos, fold 2, GIN convolutions
    python -m cgcnet_tpu.cli.train data.root=/data data.cross_val=2 \
        model.gcn_name=GIN
"""

from __future__ import annotations

import argparse
import tempfile

from cgcnet_tpu.config import Config


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", help="JSON config file")
    p.add_argument(
        "--synthetic",
        action="store_true",
        help="generate a synthetic dataset under a temp root and train on it",
    )
    p.add_argument(
        "--eval-only", action="store_true", help="skip training, evaluate only"
    )
    p.add_argument(
        "--visualize",
        action="store_true",
        help="dump GEXF cluster-assignment files during the final evaluation",
    )
    p.add_argument(
        "--cpu",
        action="store_true",
        help="force the CPU backend (8 virtual devices) — the default "
        "platform is the real TPU, which may be unreachable",
    )
    p.add_argument(
        "overrides", nargs="*", help="config overrides: section.key=value"
    )
    return p.parse_args(argv)


def main(argv=None) -> dict:
    args = parse_args(argv)
    if args.config:
        cfg = Config.from_json(open(args.config).read())
    else:
        cfg = Config()
    cfg = cfg.apply_overrides(args.overrides)

    if args.synthetic:
        from cgcnet_tpu.dataflow.synthetic import generate_dataset

        root = tempfile.mkdtemp(prefix="cgc_synth_")
        generate_dataset(root, seed=cfg.data.seed)
        cfg = cfg.apply_overrides(
            [f"data.root={root}", "data.max_num_nodes=512"]
        )

    if cfg.train.debug_nans:
        from cgcnet_tpu.utils.profiling import enable_debug_checks

        enable_debug_checks()

    # persistent compile cache (tunnel/TPU compiles are expensive) — keep it
    # OUTSIDE the run dir so every run (incl. --synthetic temp roots and
    # fresh run_id hashes) reuses the same cache; override via
    # CGCNET_COMPILE_CACHE.
    import os as _os

    import jax as _jax

    if args.cpu:
        # must happen in-process before first backend use (env vars are too
        # late once the axon plugin registered, and still dial the tunnel)
        try:
            _jax.config.update("jax_platforms", "cpu")
            _jax.config.update("jax_num_cpu_devices", 8)
        except RuntimeError:
            pass  # backend already initialized by the caller

    _cache = _os.environ.get("CGCNET_COMPILE_CACHE") or _os.path.join(
        _os.path.expanduser("~"), ".cache", "cgcnet_tpu", "jax_cache"
    )
    _os.makedirs(_cache, exist_ok=True)
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass

    from cgcnet_tpu.dataflow.dataset import NucleiGraphDataset
    from cgcnet_tpu.dataflow.loader import GraphLoader
    from cgcnet_tpu.train.loop import Trainer, evaluate, resume_state
    from cgcnet_tpu.train.optim import make_optimizer
    from cgcnet_tpu.train.state import create_train_state

    cfg = cfg.apply_overrides(
        [f"model.max_num_nodes={cfg.data.max_num_nodes}",
         f"model.input_dim={cfg.data.num_features}"]
    )

    train_ds = NucleiGraphDataset(cfg.data, "train")
    val_ds = NucleiGraphDataset(
        cfg.data, "valid", full_graph=cfg.data.full_test_graph
    )
    train_loader = GraphLoader(
        train_ds, cfg.data.batch_size, shuffle=True,
        num_workers=cfg.data.num_workers, seed=cfg.data.seed, drop_last=True,
        dynamic_buckets=cfg.data.dynamic_buckets,
    )
    # full-graph test mode evaluates one unsampled patch at a time
    # (reference NucleiDatasetTest: batch=1, dataflow/data.py:281-316)
    val_loader = GraphLoader(
        val_ds, 1 if cfg.data.full_test_graph else cfg.data.batch_size,
        shuffle=False,
        num_workers=cfg.data.num_workers,
        dynamic_buckets=cfg.data.dynamic_buckets,
    )

    steps_per_epoch = train_loader.batches_per_epoch()
    tx = make_optimizer(cfg.train, steps_per_epoch)
    example = next(iter(val_loader.epoch(0)))
    model, state = create_train_state(cfg, tx, example)

    start_epoch = 0
    if cfg.train.resume:
        state, start_epoch = resume_state(cfg, state)
        print(f"=> resumed from epoch {start_epoch}")

    trainer = Trainer(
        cfg, model, state, tx, train_loader, val_loader, start_epoch=start_epoch
    )
    if not args.eval_only:
        best = trainer.train()
        print("best:", best)
        # final evaluation reports the *selected* model (best on image-level
        # val accuracy), not whatever the last epoch left behind
        best_ckpt = trainer.run_dir / "model_best.msgpack"
        if best_ckpt.exists():
            from cgcnet_tpu.train.checkpoint import load_checkpoint

            trainer.state, _ = load_checkpoint(best_ckpt, trainer.state)
    multi_sample = cfg.data.sample_ratio < 1 and not cfg.data.full_test_graph
    final = evaluate(
        model, trainer.state, val_loader,
        test_time=cfg.train.test_epoch if multi_sample else 1,
        visualize_dir=(trainer.run_dir / "visual") if args.visualize else None,
        vote_per_repeat=cfg.train.vote_per_repeat,
        max_num_examples=cfg.train.eval_max_examples or None,
    )
    print("final:", final)
    # run_dir lets callers (crossval/rehearsal harnesses) locate
    # metrics.jsonl for per-epoch curves; excluded from crossval's mean
    # (it aggregates named metric keys only)
    return {**final, "run_dir": str(trainer.run_dir)}


if __name__ == "__main__":
    main()
