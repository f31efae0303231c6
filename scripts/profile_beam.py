"""Per-op TPU profile of the flagship beam-5 decode (and optionally the CE
train step). Traces one jitted call with jax.profiler and aggregates XLA op
self-times from the .trace.json.gz, printing the top op classes.

Usage:
    python scripts/profile_beam.py [--what beam|train] [--out /tmp/trace_dir]

The axon tunnel makes wall-clock microbenchmarks useless (~16-20 ms RTT per
dispatch); this per-op view is the only reliable optimization signal.
"""

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))  # bench_transformer


def parse_trace(log_dir):
    """Aggregate device-lane op self-times from a tensorboard trace dir."""
    paths = glob.glob(os.path.join(log_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        raise SystemExit(f"no trace files under {log_dir}")
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # find device lanes (TPU core threads carry XLA op events with 'dur')
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    device_pids = {p for p, n in pid_names.items()
                   if "TPU" in n or "/device" in n.lower() or "Chip" in n}
    by_op = collections.Counter()
    by_class = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        name = e.get("name", "?")
        args = e.get("args", {}) or {}
        lname = args.get("long_name", name)
        dur = e["dur"]  # microseconds
        by_op[name] += dur
        # crude op-class bucketing from the fusion/op name
        cls = name.split(".")[0].split("(")[0]
        for marker in ("fusion", "dynamic-update-slice", "dynamic_update",
                       "copy", "convolution", "dot", "reduce", "transpose",
                       "gather", "scatter", "sort", "broadcast", "concatenate",
                       "reshape", "slice", "select", "bitcast", "iota",
                       "all-reduce", "convert", "rng", "custom-call"):
            if marker in name:
                cls = marker
                break
        by_class[cls] += dur
        total += dur
    return path, by_op, by_class, total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", default="beam", choices=["beam", "train"])
    ap.add_argument("--family", default="flagship",
                    choices=["flagship", "transformer"],
                    help="flagship = CLIP+GPT-2+AoA (bench.py); transformer "
                         "= ViT+Transformer+MHA (bench_transformer.py, "
                         "Pallas self-attention decode)")
    ap.add_argument("--out", default="/tmp/beam_trace")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    if args.family == "transformer":
        from bench_transformer import build as _build_tr

        c, model, batch = _build_tr("pallas" if on_tpu else "xla",
                                    on_tpu, None)
    else:
        from bench import build_flagship

        c, model, batch = build_flagship(on_tpu)
    rng = jax.random.PRNGKey(0)
    images = jax.random.normal(
        rng, (batch, c.image_size, c.image_size, 3), dtype=jnp.float32)
    mc = c.model
    L = c.inference.max_length

    if args.what == "beam":
        from image_captioning_ml_project_tpu.inference.decoding import (
            beam_search)

        caps = jnp.zeros((batch, 8), dtype=jnp.int32)
        variables = model.init(rng, images, caps)
        # match the benches: serving weights pre-cast to bf16 once
        from image_captioning_ml_project_tpu.utils.amp import (
            cast_float_params)

        variables = cast_float_params(variables)

        @jax.jit
        def prog(variables, images):
            cache = model.apply(variables, images, L,
                                method=model.init_cache)

            def step_fn(s, toks):
                return model.apply(variables, s, toks, method=model.step)

            return beam_search(step_fn, cache, images.shape[0],
                               c.inference.beam_size, mc.bos_token_id,
                               mc.eos_token_id, mc.pad_token_id, L,
                               length_penalty=c.inference.length_penalty,
                               min_length=c.inference.min_length).tokens

        run = lambda: np.asarray(prog(variables, images))
    else:
        from image_captioning_ml_project_tpu.train.trainer import (
            CaptioningTrainer)

        c.training.batch_size = batch if not on_tpu else int(
            os.environ.get("PB_TRAIN_BATCH", "32"))
        c.training.use_amp = True
        c.model.decoder.max_length = 50

        class _Empty:
            examples: list = []

            def __len__(self):
                return 0

        class _Tok:
            vocab_size = c.model.vocab_size
            pad_token_id, bos_token_id, eos_token_id = 0, 1, 2

            def __len__(self):
                return self.vocab_size

            def decode(self, ids, skip_special_tokens=True):
                return ""

        trainer = CaptioningTrainer(c, _Empty(), _Empty(), _Tok())
        nprng = np.random.RandomState(0)
        bsz = c.training.batch_size
        timages = jnp.asarray(nprng.randint(
            0, 255, (bsz, c.image_size, c.image_size, 3)).astype(np.uint8))
        tcaps = jnp.asarray(nprng.randint(
            3, c.model.vocab_size, (bsz, c.model.decoder.max_length)
        ).astype(np.int32))
        key = jax.random.PRNGKey(0)

        tmask = tcaps != 0

        def run():
            trainer.state, m = trainer._train_step(
                trainer.state, timages, tcaps, tmask, key)
            return float(m["total_loss"])

    run()  # compile + warmup
    t0 = time.perf_counter()
    run()
    wall = time.perf_counter() - t0
    os.makedirs(args.out, exist_ok=True)
    jax.profiler.start_trace(args.out)
    run()
    run()
    jax.profiler.stop_trace()

    path, by_op, by_class, total = parse_trace(args.out)
    n_runs = 2
    print(f"\ntrace: {path}")
    print(f"wall per run: {wall*1e3:.1f} ms; device op time total/run: "
          f"{total/1e3/n_runs:.1f} ms\n")
    print(f"{'op class':<28}{'ms/run':>10}{'%':>7}")
    for cls, dur in by_class.most_common(args.top):
        print(f"{cls:<28}{dur/1e3/n_runs:>10.2f}{100*dur/total:>6.1f}%")
    print(f"\n{'top individual ops':<44}{'ms/run':>10}")
    for name, dur in by_op.most_common(args.top):
        print(f"{name[:44]:<44}{dur/1e3/n_runs:>10.2f}")


if __name__ == "__main__":
    main()
