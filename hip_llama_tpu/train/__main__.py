"""Train CLI: `python -m hip_llama_tpu.train [overrides]`.

Parity with the reference's train.py + configurator.py (exec-based
key=value overrides, configurator.py:1-30) but with plain --key=value flags.

Examples:
  python -m hip_llama_tpu.train --dim=64 --n_layers=3 --max_iters=200 \
      --data=synthetic --out_dir=/tmp/run
  python -m hip_llama_tpu.train --data=shards --shard_glob='data/*.bin' \
      --tokenizer=assets/tokenizer.bin --vocab_size=32000
  # full text pipeline (the reference's tinystories.py train_vocab ->
  # pretokenize -> train, tinystories.py:71-173): trains a BPE vocab of
  # --vocab_size on the text, writes out_dir/tokenizer.bin + uint16 shards,
  # then trains on them
  python -m hip_llama_tpu.train --data=text --text_glob='corpus/*.txt' \
      --vocab_size=512 --out_dir=/tmp/run
"""

from __future__ import annotations

import dataclasses
import glob
import os
import sys

from hip_llama_tpu.config import ModelConfig
from hip_llama_tpu.train.dataset import PretokDataset, synthetic_batches
from hip_llama_tpu.train.trainer import TrainConfig, Trainer


def main(argv):
    model_kw = dict(
        dim=288, hidden_dim=768, n_layers=6, n_heads=6, n_kv_heads=6,
        vocab_size=32000, seq_len=256,
    )
    tkw = {f.name: f.default for f in dataclasses.fields(TrainConfig)}
    data, shard_glob, text_glob, resume = "synthetic", "", "", ""

    for a in argv:
        if not a.startswith("--") or "=" not in a:
            print(f"bad arg {a!r}; use --key=value", file=sys.stderr)
            return 1
        k, v = a[2:].split("=", 1)
        if k in model_kw:
            model_kw[k] = int(v)
        elif k in tkw:
            cur = tkw[k]
            tkw[k] = type(cur)(v) if not isinstance(cur, str) else v
        elif k == "data":
            data = v
        elif k == "shard_glob":
            shard_glob = v
        elif k == "text_glob":
            text_glob = v
        elif k == "resume":
            resume = v
        else:
            print(f"unknown key {k!r}", file=sys.stderr)
            return 1

    cfg = ModelConfig(**model_kw)
    tcfg = TrainConfig(**tkw)
    trainer = Trainer(cfg, tcfg)
    if resume:
        trainer.load(resume)
        print(f"resumed from {resume} at iter {trainer.step_num}")

    if data == "synthetic":
        batches = synthetic_batches(cfg.vocab_size, tcfg.batch_size, cfg.seq_len)
    elif data == "text":
        # custom-vocab pipeline: train vocab -> tokenizer.bin -> shards
        from hip_llama_tpu.tokenizer import Tokenizer
        from hip_llama_tpu.train.dataset import pretokenize
        from hip_llama_tpu.train.vocab import train_vocab_file

        texts = sorted(glob.glob(text_glob))
        if not texts:
            print(f"no text files match {text_glob!r}", file=sys.stderr)
            return 1
        os.makedirs(tcfg.out_dir, exist_ok=True)
        tok_path = os.path.join(tcfg.out_dir, "tokenizer.bin")
        n_lines = train_vocab_file(texts, cfg.vocab_size, tok_path)
        print(f"trained {cfg.vocab_size}-token vocab on {n_lines} lines "
              f"-> {tok_path}")
        tok = Tokenizer.from_file(tok_path, cfg.vocab_size)
        shards = pretokenize(texts, tok, os.path.join(tcfg.out_dir, "shards"))
        batches = PretokDataset(shards, cfg.seq_len).batches(tcfg.batch_size)
    else:
        paths = sorted(glob.glob(shard_glob))
        if not paths:
            print(f"no shards match {shard_glob!r}", file=sys.stderr)
            return 1
        batches = PretokDataset(paths, cfg.seq_len).batches(tcfg.batch_size)

    trainer.fit(batches)
    os.makedirs(tcfg.out_dir, exist_ok=True)
    state = os.path.join(tcfg.out_dir, "train_state.npz")
    model = os.path.join(tcfg.out_dir, "model.bin")
    trainer.save(state)
    trainer.export_v0(model)
    print(f"saved {state} and {model}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
