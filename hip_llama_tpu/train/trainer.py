"""Training loop: optax AdamW + cosine schedule, data-parallel over a JAX
mesh, checkpoint save/resume, export to llama2.c formats.

The TPU re-design of the reference's torch-DDP trainer (train/train.py):
- DDP over NCCL (train.py:93-111)      -> batch sharded over a ("dp",) mesh;
  XLA inserts the gradient all-reduce (psum) that DDP does by hook.
- AMP fp16/bf16 + GradScaler (:124-128) -> bf16 activations, fp32 params
  and Adam state (no scaler needed for bf16).
- grad accumulation (:60,105-106)       -> micro-step lax.scan
- ckpt save/resume (:41, :300-318)      -> npz train state; export via
  io/checkpoint.py writers (v0/v1/v2) for the serving engine.
"""

from __future__ import annotations

import dataclasses
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hip_llama_tpu.config import ModelConfig
from hip_llama_tpu.io.checkpoint import LlamaWeights, random_weights, write_v0
from hip_llama_tpu.models.params import LlamaParams, params_from_weights
from hip_llama_tpu.train.model import cross_entropy_loss, make_train_forward


@dataclasses.dataclass
class TrainConfig:
    # schedule (defaults mirror train/train.py:55-68)
    learning_rate: float = 5e-4
    min_lr: float = 0.0
    warmup_iters: int = 100
    max_iters: int = 1000
    weight_decay: float = 0.1
    beta1: float = 0.9
    beta2: float = 0.95
    grad_clip: float = 1.0
    batch_size: int = 32
    grad_accum_steps: int = 1
    eval_interval: int = 200
    log_interval: int = 10
    out_dir: str = "out"
    seed: int = 1337
    # AMP: activations in bf16, params/Adam state/loss in fp32 (the bf16
    # replacement for the reference's fp16+GradScaler, train.py:124-128);
    # "float32" for exactness-sensitive comparisons
    amp_dtype: str = "bfloat16"


class Trainer:
    def __init__(
        self,
        cfg: ModelConfig,
        tcfg: TrainConfig,
        params: LlamaParams | None = None,
        mesh: Mesh | None = None,
    ):
        self.cfg = cfg
        self.tcfg = tcfg
        if tcfg.grad_accum_steps > 1 and tcfg.batch_size % tcfg.grad_accum_steps:
            raise ValueError(
                f"batch_size {tcfg.batch_size} must divide into "
                f"grad_accum_steps {tcfg.grad_accum_steps} micro-batches"
            )
        if mesh is None:
            devs = np.array(jax.devices())
            # dp must divide the per-step batch (micro-batch when accumulating)
            micro = max(tcfg.batch_size // max(tcfg.grad_accum_steps, 1), 1)
            dp = len(devs)
            while dp > 1 and micro % dp != 0:
                dp -= 1
            mesh = Mesh(devs[:dp].reshape(dp), axis_names=("dp",))
        self.mesh = mesh
        self.data_sharding = NamedSharding(mesh, P("dp"))
        self.repl_sharding = NamedSharding(mesh, P())

        if params is None:
            params = params_from_weights(random_weights(cfg, seed=tcfg.seed))
        self.params = jax.device_put(params, self.repl_sharding)

        sched = optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=tcfg.learning_rate,
            warmup_steps=tcfg.warmup_iters,
            decay_steps=max(tcfg.max_iters, tcfg.warmup_iters + 1),
            end_value=tcfg.min_lr,
        )
        # decay matmul weights + embeddings, NOT norm gains (train.py
        # configure_optimizers parity, model.py:279-293). Masking by field —
        # an ndim test would wrongly decay the STACKED (L, D) norm weights
        decay_mask = LlamaParams(
            tok_emb=True, rms_att=False, wq=True, wk=True, wv=True, wo=True,
            rms_ffn=False, w1=True, w2=True, w3=True, rms_final=False,
            wcls=True,
        )
        self.tx = optax.chain(
            optax.clip_by_global_norm(tcfg.grad_clip),
            optax.adamw(
                sched,
                b1=tcfg.beta1,
                b2=tcfg.beta2,
                weight_decay=tcfg.weight_decay,
                mask=decay_mask,
            ),
        )
        self.opt_state = jax.device_put(self.tx.init(self.params), self.repl_sharding)
        self.step_num = 0
        self._sched = sched

        forward = make_train_forward(
            cfg, act_dtype=jnp.dtype(tcfg.amp_dtype)
        )

        def loss_fn(params, tokens, targets):
            logits = forward(params, tokens)
            return cross_entropy_loss(logits, targets)

        def train_step(params, opt_state, tokens, targets):
            # grad accumulation: (A, B/A, T) micro-batches via scan
            a = tcfg.grad_accum_steps
            if a > 1:
                mb_tok = tokens.reshape(a, -1, tokens.shape[-1])
                mb_tgt = targets.reshape(a, -1, targets.shape[-1])

                def micro(acc, mb):
                    l, g = jax.value_and_grad(loss_fn)(params, mb[0], mb[1])
                    acc_l, acc_g = acc
                    return (acc_l + l, jax.tree.map(jnp.add, acc_g, g)), None

                zero = jax.tree.map(jnp.zeros_like, params)
                (loss, grads), _ = jax.lax.scan(micro, (0.0, zero), (mb_tok, mb_tgt))
                loss = loss / a
                grads = jax.tree.map(lambda g: g / a, grads)
            else:
                loss, grads = jax.value_and_grad(loss_fn)(params, tokens, targets)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        self._train_step = jax.jit(
            train_step,
            in_shardings=(
                self.repl_sharding,
                self.repl_sharding,
                self.data_sharding,
                self.data_sharding,
            ),
            out_shardings=(self.repl_sharding, self.repl_sharding, None),
            donate_argnums=(0, 1),
        )
        self._eval_loss = jax.jit(
            loss_fn,
            in_shardings=(self.repl_sharding, self.data_sharding, self.data_sharding),
        )

    def _to_global(self, arr: np.ndarray):
        """Each host feeds ITS slice of the global batch: on multi-host
        meshes, assemble the global array from process-local data (the
        multi-controller path promised by parallel/multihost.py); on one
        host this is a plain device transfer."""
        if jax.process_count() > 1:
            return jax.make_array_from_process_local_data(
                self.data_sharding, np.asarray(arr)
            )
        return jnp.asarray(arr)

    def step(self, tokens: np.ndarray, targets: np.ndarray) -> float:
        self.params, self.opt_state, loss = self._train_step(
            self.params, self.opt_state,
            self._to_global(tokens), self._to_global(targets),
        )
        self.step_num += 1
        return float(loss)

    def eval_loss(self, tokens: np.ndarray, targets: np.ndarray) -> float:
        return float(self._eval_loss(
            self.params, self._to_global(tokens), self._to_global(targets)
        ))

    def fit(self, batches, max_iters: int | None = None, log=print,
            eval_batches=None):
        """batches: iterator of (tokens, targets) np arrays. `eval_batches`
        (optional iterator of held-out batches) is evaluated every
        eval_interval steps and logged (train.py's eval loop)."""
        t0 = time.time()
        max_iters = max_iters or self.tcfg.max_iters
        losses = []
        for tokens, targets in batches:
            loss = self.step(tokens, targets)
            losses.append(loss)
            if (
                eval_batches is not None
                and self.step_num % self.tcfg.eval_interval == 0
            ):
                ev_t, ev_y = next(eval_batches)
                log(f"iter {self.step_num}: eval loss "
                    f"{self.eval_loss(ev_t, ev_y):.4f}")
            if self.step_num % self.tcfg.log_interval == 0:
                lr = float(self._sched(self.step_num))
                log(
                    f"iter {self.step_num}: loss {loss:.4f}, lr {lr:.2e}, "
                    f"{(time.time()-t0)*1000/self.tcfg.log_interval:.0f} ms/iter"
                )
                t0 = time.time()
            if self.step_num >= max_iters:
                break
        return losses

    # -- checkpointing (train.py:300-318 resume parity) ----------------------

    def save(self, path: str) -> None:
        if not path.endswith(".npz"):
            path += ".npz"  # np.savez appends it; keep load() symmetric
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        flat_p = {f"p_{i}": np.asarray(x) for i, x in enumerate(jax.tree.leaves(self.params))}
        flat_o = {f"o_{i}": np.asarray(x) for i, x in enumerate(jax.tree.leaves(self.opt_state))}
        np.savez(path, step=self.step_num, **flat_p, **flat_o)

    def load(self, path: str) -> None:
        if not path.endswith(".npz"):
            path += ".npz"
        z = np.load(path)
        self.step_num = int(z["step"])
        p_leaves = [z[f"p_{i}"] for i in range(len(jax.tree.leaves(self.params)))]
        o_leaves = [z[f"o_{i}"] for i in range(len(jax.tree.leaves(self.opt_state)))]
        self.params = jax.device_put(
            jax.tree.unflatten(jax.tree.structure(self.params), p_leaves),
            self.repl_sharding,
        )
        self.opt_state = jax.device_put(
            jax.tree.unflatten(jax.tree.structure(self.opt_state), o_leaves),
            self.repl_sharding,
        )

    # -- export to the serving formats (train/export.py parity) --------------

    def to_weights(self) -> LlamaWeights:
        p = jax.tree.map(np.asarray, self.params)

        def t(x):  # (L, in, out) -> (L, out, in) file orientation
            return np.swapaxes(x, -1, -2)

        return LlamaWeights(
            tok_emb=p.tok_emb,
            rms_att=p.rms_att,
            wq=t(p.wq), wk=t(p.wk), wv=t(p.wv), wo=t(p.wo),
            rms_ffn=p.rms_ffn,
            w1=t(p.w1), w2=t(p.w2), w3=t(p.w3),
            rms_final=p.rms_final,
            wcls=p.wcls.T,
        )

    def export_v0(self, path: str) -> None:
        # training optimizes wcls and tok_emb as INDEPENDENT params, so
        # always export the classifier explicitly — a shared_classifier
        # header would make readers alias wcls to the embedding table and
        # silently discard the trained head
        cfg = dataclasses.replace(self.cfg, shared_classifier=False)
        write_v0(path, cfg, self.to_weights())
