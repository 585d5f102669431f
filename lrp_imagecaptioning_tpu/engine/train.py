"""Training engine: pjit-sharded train steps + host epoch loop.

Replaces the reference's four per-epoch train functions and bookkeeping
(``train.py:113-151,154-286``) with one Trainer that

- jits each mode's update over a ``(data, model)`` mesh (data-parallel grad
  psum over ICI; optional vocab-dim tensor parallelism for embedding/fc),
- keeps Adam(0.8, 0.999) with per-group LRs and the elementwise +-grad_clip
  clamp (train.py:97-109, modelutils.py:102-112),
- reproduces the plateau schedule: LR * 0.8 when no CIDEr improvement for 2
  epochs, floored at 2e-5 (train.py:117-118, modelutils.py:147-159),
- validates with beam search (beam=3) each epoch and checkpoints best-by-CIDEr
  (train.py:140-151).

SCST split: rollouts run as one jitted program, the CIDEr advantage is
computed on host (pre-tokenized, pure Python or the C++ scorer), and the
policy-gradient update re-derives the sampled tokens' logprobs by
teacher-forcing the sampled sequence — gradients flow through the re-forward,
which is bitwise-identical to the rollout's logprobs because both run the same
step function with dropout off.
"""

from __future__ import annotations

import time
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..config import ExperimentConfig
from ..data.dataset import CaptionDataset
from ..data.vocab import (
    WordMap,
    bad_endings_for,
    decode_to_words,
    remove_bad_endings,
)
from ..metrics import BLEU, CIDEr
from ..models.captioner import Captioner, CaptionerParams
from ..parallel import (
    batch_sharding,
    build_mesh,
    global_batch_from_local,
    host_shard,
    param_shardings,
    replicate_global,
    replicated,
)
from .losses import cross_entropy_loss, reward_criterion, top1_accuracy
from .scst import get_self_critical_reward


@struct.dataclass
class TrainState:
    params: CaptionerParams
    opt_state: Any
    step: jax.Array


class AverageMeter:
    """Running average (modelutils.py:10-28)."""

    def __init__(self):
        self.val = self.sum = self.count = self.avg = 0.0

    def update(self, val: float, n: float = 1.0):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1e-12)


def _param_labels(params: CaptionerParams):
    enc = jax.tree_util.tree_map(lambda _: "encoder", params.encoder)
    dec = jax.tree_util.tree_map(lambda _: "decoder", params.decoder)
    return CaptionerParams(enc, dec)


class Trainer:
    def __init__(
        self,
        exp: ExperimentConfig,
        word_map: WordMap,
        *,
        mesh=None,
        captioner: Captioner | None = None,
    ):
        if exp.model.vocab_size == 0:
            import dataclasses

            exp = exp.replace(
                model=dataclasses.replace(exp.model, vocab_size=len(word_map))
            )
        self.exp = exp
        self.cfg = exp.model
        self.tcfg = exp.train
        self.word_map = word_map
        self.captioner = captioner or Captioner(self.cfg)
        self.mesh = mesh if mesh is not None else build_mesh(exp.mesh)
        dp = self.mesh.shape[exp.mesh.data_axis]
        if self.tcfg.batch_size % dp != 0:
            raise ValueError(
                f"batch_size={self.tcfg.batch_size} must be divisible by the "
                f"data-parallel axis ({dp} devices)"
            )
        self.pad_id = word_map.pad
        self._build_optimizer()
        self._compiled: dict[str, Callable] = {}

    # ------------------------------------------------------------------
    def _build_optimizer(self):
        t = self.tcfg
        labels = None  # resolved lazily from params

        def build(decoder_lr, encoder_lr):
            dec = optax.chain(
                optax.clip(t.grad_clip),
                optax.adam(decoder_lr, b1=t.adam_b1, b2=t.adam_b2),
            )
            if t.finetune_encoder:
                enc = optax.chain(
                    optax.clip(t.grad_clip),
                    optax.adam(encoder_lr, b1=t.adam_b1, b2=t.adam_b2),
                )
            else:
                enc = optax.set_to_zero()  # frozen CNN (train.py:102-104)
            return optax.multi_transform(
                {"decoder": dec, "encoder": enc}, _param_labels
            )

        self.tx = optax.inject_hyperparams(build)(
            decoder_lr=t.decoder_lr, encoder_lr=t.encoder_lr
        )

    def init_state(self, rng: jax.Array) -> TrainState:
        params = self.captioner.init(rng)
        # place params according to the mesh sharding layout
        shardings = param_shardings(params, self.mesh, self.exp.mesh)
        params = jax.tree_util.tree_map(jax.device_put, params, shardings)
        opt_state = self.tx.init(params)
        # Optax moments inherit the param shardings (zeros_like preserves
        # placement), but freshly-created scalars (Adam count, injected
        # hyperparams) land uncommitted on the default device.  Commit them
        # replicated over the mesh so the WHOLE state carries mesh
        # shardings — otherwise an Orbax restore (which adopts the
        # template's committed placements) mixes single-device scalars with
        # mesh-sharded params and the jitted steps reject the state.
        rep = replicated(self.mesh)

        def _commit(x):
            sh = getattr(x, "sharding", None)
            if (isinstance(sh, jax.sharding.NamedSharding)
                    and sh.mesh == self.mesh):
                return x
            return jax.device_put(x, rep)

        opt_state = jax.tree_util.tree_map(_commit, opt_state)
        step = jax.device_put(jnp.zeros((), jnp.int32), rep)
        return TrainState(params, opt_state, step)

    # -- learning-rate plateau decay -----------------------------------
    def decay_lr(self, state: TrainState) -> TrainState:
        t = self.tcfg
        hp = dict(state.opt_state.hyperparams)
        for k in ("decoder_lr", "encoder_lr"):
            lr = hp[k]
            hp[k] = jnp.where(lr > t.lr_floor, lr * t.lr_shrink_factor, lr)
        return state.replace(opt_state=state.opt_state._replace(hyperparams=hp))

    def current_lr(self, state: TrainState) -> float:
        return float(state.opt_state.hyperparams["decoder_lr"])

    # ------------------------------------------------------------------
    def _jit(self, name: str, fn: Callable, **kw) -> Callable:
        if name not in self._compiled:
            self._compiled[name] = jax.jit(fn, **kw)
        return self._compiled[name]

    def _upload_images(self, images: np.ndarray) -> np.ndarray:
        """Cast a float image batch to the configured transfer dtype before
        the host->device upload (uint8 batches pass through — they were
        quantized at the dataset).  The jitted steps upcast/normalize on
        device (models.captioner.prepare_visual)."""
        if (self.tcfg.upload_dtype != "float32"
                and images.dtype == np.float32
                and not self.cfg.is_bu):
            return images.astype(jnp.bfloat16)
        return images

    # -- shared fine-tuning encode ---------------------------------------
    def _train_encode(self, params, images):
        """Encode for a gradient step.  Returns (feats, bn_stats) where
        bn_stats is the encoder tree with refreshed BN running stats when
        finetuning a ResNet (train-mode BatchNorm, reference train.py:95-109),
        else None."""
        if self.tcfg.finetune_encoder:
            return self.captioner.encode_train(params, images)
        return self.captioner.encode(
            params, images, stop_encoder_gradient=True), None

    def _apply_bn_stats(self, params, bn_stats):
        """Fold the step's BN running stats back into the (already
        optimizer-updated) params so eval/LRP see the tuned BN."""
        if bn_stats is None:
            return params
        from ..models.resnet import merge_bn_stats

        return params.replace(
            encoder=merge_bn_stats(params.encoder, bn_stats))

    # -- XE mode --------------------------------------------------------
    def xe_step(self, state: TrainState, images, captions, rng):
        def loss_fn(params):
            feats, bn_stats = self._train_encode(params, images)
            num_steps = captions.shape[1] - 1
            logits, _, _ = self.captioner.forward(
                params, feats, captions, num_steps=num_steps,
                ss_prob=self.tcfg.ss_prob, rng=rng, train=True,
            )
            targets = captions[:, 1:]
            loss = cross_entropy_loss(logits, targets, self.pad_id)
            acc = top1_accuracy(logits, targets, self.pad_id)
            return loss, (acc, bn_stats)

        (loss, (acc, bn_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = self._apply_bn_stats(
            optax.apply_updates(state.params, updates), bn_stats)
        return state.replace(params=params, opt_state=opt_state,
                             step=state.step + 1), loss, acc

    def compiled_xe_step(self):
        bs = batch_sharding(self.mesh, self.exp.mesh)
        rep = replicated(self.mesh)
        return self._jit(
            "xe", self.xe_step,
            in_shardings=(None, bs, bs, rep), donate_argnums=(0,),
        )

    # -- SCST mode ------------------------------------------------------
    def _encode_cnn_jit(self, state: TrainState, images):
        """Run the (frozen) CNN half once per SCST step; rollout and update
        share the result instead of each re-running the conv stack."""
        fn = self._jit(
            "scst_encode_cnn",
            lambda s, im: self.captioner.encode_cnn(s.params, im),
        )
        return fn(state, images)

    def scst_rollout(self, state: TrainState, raw, avg, num_steps: int, rng):
        """Greedy baseline (no grad) + sampled rollout, one program."""
        feats = self.captioner.project_features(state.params, raw, avg)
        greedy = self.captioner.sample(
            state.params, feats, self.word_map,
            jax.random.PRNGKey(0), num_steps=num_steps, sample_method="greedy",
        )
        sampled = self.captioner.sample(
            state.params, feats, self.word_map, rng,
            num_steps=num_steps, sample_method="sample",
        )
        return greedy.tokens, sampled.tokens

    def scst_encode_rollout(self, state: TrainState, images, num_steps: int,
                            rng):
        """Frozen-CNN encode + both rollouts as ONE program.

        The SCST step's real device work is tiny (measured batch-32 224²:
        encode 12 ms + rollout 5 ms + update 9 ms) but each separate jit
        call pays the host round trip, which dominates on a remote-tunnel
        device (733 ms end-to-end vs 41 ms of phases).  Fusing encode into
        the rollout program removes one round trip per step; raw/avg come
        back as device handles for the update to share (the reference
        re-runs the CNN twice per batch instead, train.py:189-192).
        Measured on v5e with a device-resident batch
        (tools/bench_train_step.py --mode scst): 105.5 ms/step = 303
        img/s, phases encode+rollout 15.1 / tokens-to-host 6.6 / host
        CIDEr 9.7 / update 10.6 ms — the residual is the tunnel's three
        remaining per-step round trips."""
        raw, avg = self.captioner.encode_cnn(state.params, images)
        g, s = self.scst_rollout(state, raw, avg, num_steps, rng)
        return raw, avg, g, s

    def scst_update(self, state: TrainState, raw, avg, images, sampled,
                    reward, captions=None):
        """Policy-gradient update: teacher-force the sampled sequence to
        recover its logprobs with gradients attached.  With
        ``scst_ce_weight > 0`` a teacher-forced CE anchor on the ground-truth
        caption is mixed in (beyond-reference collapse guard,
        docs/QUALITY.md).

        ``raw``/``avg`` are the shared frozen-CNN features; with
        ``finetune_encoder`` the CNN re-runs here instead so gradients reach
        it (``images`` is unused/DCE'd otherwise)."""

        def loss_fn(params):
            if self.tcfg.finetune_encoder:
                feats, bn_stats = self._train_encode(params, images)
            else:
                feats = self.captioner.project_features(params, raw, avg)
                bn_stats = None
            b, ts = sampled.shape
            start_col = jnp.full((b, 1), self.word_map.start, jnp.int32)
            inputs = jnp.concatenate([start_col, sampled], axis=1)
            logits, _, _ = self.captioner.forward(
                params, feats, inputs, num_steps=ts, train=False,
            )
            logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            lp = jnp.take_along_axis(logprobs, sampled[..., None], -1)[..., 0]
            loss = reward_criterion(lp, sampled, reward)
            if self.tcfg.scst_ce_weight > 0.0 and captions is not None:
                ce_logits, _, _ = self.captioner.forward(
                    params, feats, captions,
                    num_steps=captions.shape[1] - 1, train=True,
                )
                loss = loss + self.tcfg.scst_ce_weight * cross_entropy_loss(
                    ce_logits, captions[:, 1:], self.pad_id)
            return loss, bn_stats

        (loss, bn_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = self._apply_bn_stats(
            optax.apply_updates(state.params, updates), bn_stats)
        return state.replace(params=params, opt_state=opt_state,
                             step=state.step + 1), loss

    def scst_batch(self, state: TrainState, batch, rng, num_steps: int):
        """Full SCST step: device encode+rollout (one program) -> host CIDEr
        advantage -> device update (the one host round-trip per step,
        SURVEY.md §5).  ``batch.images`` may already be a device array (the
        prefetched epoch loop uploads in its producer thread).  Batch inputs
        are placed with the mesh's data-parallel sharding so the rollout and
        update actually split rows over ``data`` like the XE step (committed
        shardings drive GSPMD; without them the batch stays replicated)."""
        return self._scst_batch_impl(state, batch, rng, num_steps,
                                     use_lrp=False)

    def _scst_batch_impl(self, state: TrainState, batch, rng, num_steps: int,
                         *, use_lrp: bool):
        """Shared SCST / LRP-SCST step (see :meth:`scst_batch`).

        Multi-process semantics: the reference's reward cooks CIDEr idf over
        the per-batch 2B-item corpus (sampled + greedy,
        modelutils.py:216-223).  Under host-sharded batches a local-rows
        reward would build idf over B/num_hosts items and diverge from the
        single-process reward, so the rollout's token outputs come back
        fully REPLICATED (XLA all-gathers the tiny (B, T) int32 over ICI)
        and every process computes the IDENTICAL reward over the global
        corpus — ``batch.all_captions`` must be the global (B, C, L) host
        array, which the every-host-reads-everything epoch loop provides.
        Pinned equal to the single-process reward by
        tests/test_distributed.py."""
        bs = batch_sharding(self.mesh, self.exp.mesh)
        multihost = jax.process_count() > 1
        axis = self.exp.mesh.data_axis
        prefix = "lrp_scst" if use_lrp else "scst"
        ro_fn = (self.lrp_scst_encode_rollout if use_lrp
                 else self.scst_encode_rollout)
        upd_fn = self.lrp_scst_update if use_lrp else self.scst_update
        if isinstance(batch.images, jax.Array):
            images = batch.images
        elif multihost:
            images = global_batch_from_local(
                self.mesh, host_shard(self._upload_images(batch.images)), axis)
        else:
            images = jax.device_put(
                jnp.asarray(self._upload_images(batch.images)), bs)
        if multihost:
            rep = replicated(self.mesh)
            ro = self._jit(prefix + "_encode_rollout_mh", ro_fn,
                           static_argnums=(2,),
                           out_shardings=(bs, bs, rep, rep))
        else:
            ro = self._jit(prefix + "_encode_rollout", ro_fn,
                           static_argnums=(2,))
        raw, avg, greedy_toks, sampled_toks = ro(state, images, num_steps, rng)
        reward = get_self_critical_reward(
            np.asarray(greedy_toks), batch.all_captions, np.asarray(sampled_toks),
            self.word_map,
            cider_reward_weight=self.tcfg.cider_reward_weight,
            bleu_reward_weight=self.tcfg.bleu_reward_weight,
        )
        upd = self._jit(prefix + "_update", upd_fn)
        want_caps = self.tcfg.scst_ce_weight > 0.0
        if multihost:
            reward_d = global_batch_from_local(self.mesh, host_shard(reward),
                                               axis)
            caps = (global_batch_from_local(
                self.mesh, host_shard(np.asarray(batch.captions)), axis)
                if want_caps else None)
        else:
            reward_d = jax.device_put(jnp.asarray(reward), bs)
            caps = (jax.device_put(jnp.asarray(batch.captions), bs)
                    if want_caps else None)
        state, loss = upd(state, raw, avg, images, sampled_toks,
                          reward_d, caps)
        # loss stays an unmaterialized device ref (float() would add a tunnel
        # round trip per step); reward is host numpy already
        return state, loss, float(reward[:, 0].mean())

    # -- LRP-inference fine-tuning modes --------------------------------
    @property
    def stop_mask(self):
        if not hasattr(self, "_stop_mask"):
            from ..models.lrp_tuning import stop_word_mask

            self._stop_mask = stop_word_mask(self.word_map, self.cfg.padded_vocab)
        return self._stop_mask

    def lrp_xe_step(self, state: TrainState, images, captions, rng):
        """lrp_tune: loss = CE(standard) + CE(lrp-weighted)
        (train_lrp, train.py:211-242)."""

        def loss_fn(params):
            feats, bn_stats = self._train_encode(params, images)
            num_steps = captions.shape[1] - 1
            logits, weighted = self.captioner.forward_lrp(
                params, feats, captions, self.stop_mask, num_steps=num_steps
            )
            targets = captions[:, 1:]
            loss = (
                cross_entropy_loss(logits, targets, self.pad_id)
                + cross_entropy_loss(weighted, targets, self.pad_id)
            )
            acc = top1_accuracy(logits, targets, self.pad_id)
            return loss, (acc, bn_stats)

        (loss, (acc, bn_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = self._apply_bn_stats(
            optax.apply_updates(state.params, updates), bn_stats)
        return state.replace(params=params, opt_state=opt_state,
                             step=state.step + 1), loss, acc

    def lrp_scst_rollout(self, state: TrainState, raw, avg, num_steps: int,
                         rng):
        """Greedy baseline + LRP-weighted sampled rollout
        (trainciderlrp, train.py:252-286)."""
        feats = self.captioner.project_features(state.params, raw, avg)
        greedy = self.captioner.sample(
            state.params, feats, self.word_map, jax.random.PRNGKey(0),
            num_steps=num_steps, sample_method="greedy",
        )
        sampled, _ = self.captioner.sample_lrp(
            state.params, feats, self.stop_mask, self.word_map, rng,
            num_steps=num_steps,
        )
        return greedy.tokens, sampled

    def lrp_scst_update(self, state: TrainState, raw, avg, images, sampled,
                        reward, captions=None):
        """Policy gradient through the LRP-weighted logprobs (re-derived by
        teacher-forcing the sampled sequence through forward_lrp).  Shared
        frozen-CNN features like :meth:`scst_update`, including the optional
        ``scst_ce_weight`` teacher-forced CE anchor (same collapse guard —
        without it this mode reproduces the recorded SCST degeneration on
        synthetic corpora, docs/QUALITY.md)."""

        def loss_fn(params):
            if self.tcfg.finetune_encoder:
                feats, bn_stats = self._train_encode(params, images)
            else:
                feats = self.captioner.project_features(params, raw, avg)
                bn_stats = None
            b, ts = sampled.shape
            start_col = jnp.full((b, 1), self.word_map.start, jnp.int32)
            inputs = jnp.concatenate([start_col, sampled], axis=1)
            _, weighted = self.captioner.forward_lrp(
                params, feats, inputs, self.stop_mask, num_steps=ts
            )
            logprobs = jax.nn.log_softmax(weighted.astype(jnp.float32), -1)
            lp = jnp.take_along_axis(logprobs, sampled[..., None], -1)[..., 0]
            loss = reward_criterion(lp, sampled, reward)
            if self.tcfg.scst_ce_weight > 0.0 and captions is not None:
                ce_logits, _, _ = self.captioner.forward(
                    params, feats, captions,
                    num_steps=captions.shape[1] - 1, train=True,
                )
                loss = loss + self.tcfg.scst_ce_weight * cross_entropy_loss(
                    ce_logits, captions[:, 1:], self.pad_id)
            return loss, bn_stats

        (loss, bn_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = self._apply_bn_stats(
            optax.apply_updates(state.params, updates), bn_stats)
        return state.replace(params=params, opt_state=opt_state,
                             step=state.step + 1), loss

    def lrp_scst_encode_rollout(self, state: TrainState, images,
                                num_steps: int, rng):
        """Encode + LRP rollouts fused like :meth:`scst_encode_rollout`."""
        raw, avg = self.captioner.encode_cnn(state.params, images)
        g, s = self.lrp_scst_rollout(state, raw, avg, num_steps, rng)
        return raw, avg, g, s

    def lrp_scst_batch(self, state: TrainState, batch, rng, num_steps: int):
        return self._scst_batch_impl(state, batch, rng, num_steps,
                                     use_lrp=True)

    # -- epoch loops ----------------------------------------------------
    def train_epoch_xe(self, state: TrainState, ds: CaptionDataset, epoch: int,
                       rng: jax.Array):
        step = self.compiled_xe_step()
        bs = batch_sharding(self.mesh, self.exp.mesh)
        return self._run_teacher_forced_epoch(step, state, ds, epoch, rng, bs)

    def _run_teacher_forced_epoch(self, step, state, ds, epoch, rng, bs):
        """Shared XE/LRP-XE epoch loop with ZERO per-step host<->device
        round trips beyond the batch upload itself.

        On the remote-tunnel backend every eager device op — a ``float()``,
        a ``jax.random.split``, even ``loss * n`` with a fresh Python scalar
        (which RE-COMPILES a one-op program per step) — costs a full network
        round trip, ~100x the step's actual compute.  So: rngs for the whole
        epoch are split in ONE device call up front and passed as host rows,
        per-step losses are kept as unmaterialized device references, and
        averages materialize via a single ``jnp.stack`` at print boundaries
        and at epoch end."""
        n_steps = max(1, len(ds) // self.tcfg.batch_size)
        rngs = np.asarray(jax.random.split(rng, n_steps + 1))
        loss_refs, acc_refs, ns = [], [], []

        def avgs():
            v = np.asarray(jnp.stack(loss_refs), np.float64)
            a = np.asarray(jnp.stack(acc_refs), np.float64)
            w = np.asarray(ns)
            return float(np.average(v, weights=w)), float(np.average(a, weights=w))

        multihost = jax.process_count() > 1

        def upload(batch):
            # runs in the prefetch thread: host->device upload overlaps the
            # consumer's step dispatch.  Multi-host input model: every
            # process iterates the IDENTICAL seeded dataset order and keeps
            # its contiguous row slice (host_shard), assembled into one
            # global dp-sharded array (SURVEY §2.2 recipe; pinned equal to
            # the single-process step by tests/test_distributed.py).
            imgs = self._upload_images(batch.images)
            if multihost:
                g = global_batch_from_local(
                    self.mesh,
                    host_shard({"images": imgs, "captions": batch.captions}),
                    self.exp.mesh.data_axis)
                return (g["images"], g["captions"],
                        float(batch.caption_lengths.sum()))
            return (jax.device_put(jnp.asarray(imgs), bs),
                    jax.device_put(jnp.asarray(batch.captions), bs),
                    float(batch.caption_lengths.sum()))

        for i, (images_d, caps_d, n) in enumerate(
                ds.train_batches_prefetched(self.tcfg.batch_size,
                                            transform=upload,
                                            workers=self.tcfg.upload_workers)):
            state, loss, acc = step(state, images_d, caps_d,
                                    rngs[min(i, n_steps - 1)])
            loss_refs.append(loss)
            acc_refs.append(acc)
            ns.append(n)
            if i % self.tcfg.print_freq == 0:  # the only device syncs
                al, aa = avgs()
                print(f"Epoch: [{epoch}][{i}] Loss {float(loss):.4f} ({al:.4f}) "
                      f"Top-1 {float(acc):.3f} ({aa:.3f})")
        avg = avgs()[0] if loss_refs else 0.0
        return state, avg, jnp.asarray(rngs[-1])

    def train_epoch_scst(self, state: TrainState, ds: CaptionDataset, epoch: int,
                         rng: jax.Array, *, use_lrp: bool = False,
                         mid_epoch_checkpoints: bool | None = None):
        num_steps = self.tcfg.max_caption_len - 1
        step_fn = self.lrp_scst_batch if use_lrp else self.scst_batch
        # the reference's trainciderlrp dumps a mid-epoch checkpoint at every
        # print boundary (train.py:280-285); same policy, sane location —
        # opt-in via fit(save_checkpoints=True)
        mid = bool(mid_epoch_checkpoints)
        n_steps = max(1, len(ds) // self.tcfg.batch_size)
        rngs = np.asarray(jax.random.split(rng, n_steps + 1))
        loss_refs = []  # device refs — materialize at boundaries only
        rewards = AverageMeter()

        bs = batch_sharding(self.mesh, self.exp.mesh)

        multihost = jax.process_count() > 1

        def upload(batch):
            # producer-thread host->device image upload overlaps the consumer
            # step (same double buffering as the teacher-forced loop; the
            # SCST semantics are untouched — rollout N+1 still runs on the
            # params produced by update N); placed with the data-parallel
            # sharding so the step splits rows over the mesh.  Multi-host:
            # every process sees the identical batch, uploads only its
            # host_shard rows; captions/all_captions stay host-global for
            # the global-corpus reward (_scst_batch_impl).
            import dataclasses as _dc

            imgs = self._upload_images(batch.images)
            if multihost:
                img_d = global_batch_from_local(
                    self.mesh, host_shard(imgs), self.exp.mesh.data_axis)
            else:
                img_d = jax.device_put(jnp.asarray(imgs), bs)
            return _dc.replace(batch, images=img_d)

        for i, batch in enumerate(ds.train_batches_prefetched(
                self.tcfg.batch_size, transform=upload,
                workers=self.tcfg.upload_workers)):
            state, loss, rew = step_fn(state, batch,
                                       rngs[min(i, n_steps - 1)], num_steps)
            loss_refs.append(loss)
            rewards.update(rew)
            if i % self.tcfg.print_freq == 0:
                avg = float(np.mean(np.asarray(jnp.stack(loss_refs))))
                print(f"Epoch: [{epoch}][{i}] Loss {float(loss):.4f} "
                      f"({avg:.4f}) Reward {rewards.val:.3f} "
                      f"({rewards.avg:.3f})")
                if mid and self.exp.save_path:
                    from .checkpoint import save_checkpoint

                    save_checkpoint(
                        self.tcfg.dataset, f"{epoch}lrpcider_batch{i}", 0,
                        state, 0.0, 0.0, self.exp.save_path, self.cfg.encoder,
                    )
        avg = (float(np.mean(np.asarray(jnp.stack(loss_refs))))
               if loss_refs else 0.0)
        return state, avg, jnp.asarray(rngs[-1])

    def train_epoch_lrp(self, state: TrainState, ds: CaptionDataset, epoch: int,
                        rng: jax.Array):
        bs = batch_sharding(self.mesh, self.exp.mesh)
        step = self._jit(
            "lrp_xe", self.lrp_xe_step,
            in_shardings=(None, bs, bs, replicated(self.mesh)),
            donate_argnums=(0,),
        )
        return self._run_teacher_forced_epoch(step, state, ds, epoch, rng, bs)

    # -- validation -----------------------------------------------------
    def validate(self, state: TrainState, ds: CaptionDataset, *,
                 beam_size: int = 3, eval_batch: int = 8,
                 max_cap_length: int = 20,
                 full_metrics: bool = False) -> tuple[float, float]:
        """Beam-search decode the val split, score BLEU-4 + CIDEr; with
        ``full_metrics`` also SPICE/ROUGE like the reference's per-epoch print
        (train.py:328-336)."""
        cap = self.captioner

        def decode_batch(params, images):
            feats = cap.encode(params, images)
            return cap.beam_search_batch(
                params, feats, self.word_map,
                beam_size=beam_size, max_cap_length=max_cap_length,
            )

        fn = self._jit("val_decode", decode_batch)
        # dispatch every batch first, keep device refs; ONE stacked transfer
        # at the end (a per-batch np.asarray costs a tunnel round trip each).
        # Multi-host: eval images are replicated from identical per-process
        # host data (device_put can't target non-addressable devices), so
        # every process decodes the full split and computes the same scores.
        multihost = jax.process_count() > 1
        pend = []
        for eb in ds.eval_batches(eval_batch):
            imgs = (replicate_global(self.mesh, eb.images) if multihost
                    else jnp.asarray(eb.images))
            res = fn(state.params, imgs)
            pend.append((res, eb))
        if pend:
            all_toks = np.asarray(jnp.stack([r.tokens for r, _ in pend]))
            all_lens = np.asarray(jnp.stack([r.length for r, _ in pend]))
        hypotheses, references = {}, {}
        image_id = 0
        for b, (_, eb) in enumerate(pend):
            toks, lens = all_toks[b], all_lens[b]
            for j in range(len(eb.filenames)):
                if not eb.valid[j]:
                    continue
                words = decode_to_words(toks[j][: lens[j]], self.word_map)
                sentence = remove_bad_endings(
                    [" ".join(words)], bad_endings_for(self.cfg.model_type))[0]
                hypotheses[image_id] = [{"caption": sentence}]
                references[image_id] = [
                    {"caption": " ".join(decode_to_words(r, self.word_map))}
                    for r in eb.all_captions[j]
                ]
                image_id += 1
        bleu = BLEU().calculate(hypotheses, references)["bleu_4"]
        cider = CIDEr().calculate(hypotheses, references)["cider"]
        if full_metrics:
            import warnings

            from ..metrics import ROUGE, SPICE

            rouge = ROUGE().calculate(hypotheses, references)["rouge"]
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                spice = SPICE().calculate(hypotheses, references)["spice"]
            print(f"BLEU-4: {bleu:.4f}, Cider: {cider:.4f}, "
                  f"SPICE: {spice:.4f}, ROUGE: {rouge:.4f}")
        return float(bleu), float(cider)

    # -- full fit -------------------------------------------------------
    def fit(self, train_ds: CaptionDataset, val_ds: CaptionDataset, *,
            epochs: int | None = None, state: TrainState | None = None,
            validate_beam: int = 3, on_epoch_end: Callable | None = None,
            save_checkpoints: bool = False):
        from ..utils.profiling import StepTimer

        t = self.tcfg
        rng = jax.random.PRNGKey(t.seed)
        if state is None:
            rng, init_rng = jax.random.split(rng)
            state = self.init_state(init_rng)
        best_cider = 0.0
        epochs_since_improvement = 0
        history = []
        timer = StepTimer()
        mode = t.mode
        for epoch in range(epochs if epochs is not None else t.epochs):
            if epochs_since_improvement >= t.plateau_patience:
                state = self.decay_lr(state)
                epochs_since_improvement = 0
                print(f"DECAYING learning rate -> {self.current_lr(state):.6f}")
            t0 = time.time()
            with timer.measure(f"train_{mode}"):
                if mode == "xe":
                    state, loss, rng = self.train_epoch_xe(state, train_ds,
                                                           epoch, rng)
                elif mode == "cider":
                    state, loss, rng = self.train_epoch_scst(state, train_ds,
                                                             epoch, rng)
                elif mode == "lrp":
                    state, loss, rng = self.train_epoch_lrp(state, train_ds,
                                                            epoch, rng)
                elif mode == "lrp_cider":
                    state, loss, rng = self.train_epoch_scst(
                        state, train_ds, epoch, rng, use_lrp=True,
                        mid_epoch_checkpoints=save_checkpoints,
                    )
                else:
                    raise NotImplementedError(f"unknown mode {mode}")
            with timer.measure("validate"):
                bleu, cider = self.validate(state, val_ds,
                                            beam_size=validate_beam)
            is_best = cider > best_cider
            best_cider = max(cider, best_cider)
            epochs_since_improvement = 0 if is_best else epochs_since_improvement + 1
            history.append(dict(epoch=epoch, loss=loss, bleu4=bleu, cider=cider,
                                seconds=time.time() - t0))
            print(f"Epoch {epoch}: loss {loss:.4f} BLEU-4 {bleu:.4f} "
                  f"CIDEr {cider:.4f} ({history[-1]['seconds']:.1f}s; "
                  f"{timer.report()})")
            if on_epoch_end is not None:
                on_epoch_end(state, epoch, dict(bleu4=bleu, cider=cider,
                                                is_best=is_best))
            elif save_checkpoints:
                from .checkpoint import save_checkpoint

                # the lrp mode tags epochs like the reference (train.py:148-151)
                tag = f"{epoch}lrp" if mode == "lrp" else epoch
                save_checkpoint(
                    t.dataset, tag, epochs_since_improvement, state,
                    bleu, cider, self.exp.save_path, self.cfg.encoder,
                )
        return state, history
