"""Training driver — the equivalent of train_video.lua.

Semantics preserved from the reference closure ``f`` (train_video.lua:245-379):
  * frame-1 stylization: zeros (single_image source) / the model itself with
    a zero prior / a finished image model — never on the gradient path
  * per-step recurrence: warp previous output (forward-only), mask by eroded
    certainty, fill occlusions, re-stylize
  * gradients flow ONLY through the final unrolled step (the reference calls
    model:backward once, :371-373); ``full_bptt=True`` lifts that
  * loss = percep_weight * perceptual(out_last, content_last)
         + pixel_weight * pixel(out_last * cert, warped_prev * cert)
         + tv_strength-weighted TV of the final output (the reference's
           in-model TotalVariation layer)
  * data-mix roulette wheel, iteration-keyed frame-step and LR schedules,
    single_image_until warmup, validation sweep over all sources

Reference divergence (documented, not replicated): train_video.lua:357
multiplies the *reported* pixel loss by a shadowed zero local — the reported
value is wrong there while the gradient is right. We report the true value.

TPU-native: one jitted train step per (num_steps, source-kind) pair; batch
axis sharded over the mesh 'data' axis (gradients psum over ICI); adam via
optax with injected learning rate; orbax for train-state checkpoints and the
portable .npz model export for the inference CLIs.
"""

from __future__ import annotations

import dataclasses
import functools
import json
import os
import time
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core import io as core_io
from ..core.config import (
    TrainOptions,
    data_mix_wheel,
    parse_data_mix,
    parse_iter_schedule,
    parse_layers,
    parse_lr_schedule,
    schedule_value,
)
from ..models import arch_dsl, checkpoint as model_ckpt, stylizer, vgg
from ..ops import filters, tv, warp
from ..ops.preprocess import vgg_deprocess, vgg_preprocess
from ..parallel import mesh as pmesh
from . import data as data_mod
from . import losses


@dataclasses.dataclass
class TrainState:
    params: dict
    opt_state: tuple
    iteration: int


class Trainer:
    def __init__(self, opt: TrainOptions, vgg_params=None, image_model=None):
        self.opt = opt
        self.spec = arch_dsl.parse_arch(
            opt.arch,
            in_channels=7,
            padding_type=opt.padding_type,
            use_instance_norm=opt.use_instance_norm,
            tanh_constant=opt.tanh_constant,
        )
        self.key = jax.random.PRNGKey(opt.seed)
        self.mesh = pmesh.make_mesh(opt.num_data_devices)
        # multi-process: rendezvous the gloo cliques NOW, before the model
        # init compiles stagger the ranks past the 30 s context deadline
        pmesh.prime_collectives(self.mesh)

        # loss network
        style_layers, style_weights = parse_layers(opt.style_layers, opt.style_weights)
        content_layers, content_weights = parse_layers(opt.content_layers, opt.content_weights)
        self.percep_cfg = losses.PerceptualConfig(
            style_layers=tuple(int(l) for l in style_layers),
            style_weights=tuple(style_weights),
            content_layers=tuple(int(l) for l in content_layers),
            content_weights=tuple(content_weights),
            agg_type=opt.style_target_type,
            extractor=("rgb-pyramid"
                       if opt.loss_network == "rgb-pyramid" else "vgg"),
        )
        if vgg_params is None and self.percep_cfg.extractor == "vgg":
            # no pretrained weights available: random-init VGG taps (weak
            # but nonzero style signal; --loss_network rgb-pyramid selects
            # the deterministic in-tree loss instead)
            self.key, k = jax.random.split(self.key)
            vgg_params = vgg.init_params(k)
        self.vgg_params = vgg_params

        # style targets
        self.style_tgts: Optional[List[jnp.ndarray]] = None
        if opt.style_image:
            style = core_io.load_image(opt.style_image)
            style = _scale_shorter_side(style, opt.style_image_size)
            pre = vgg_preprocess(jnp.asarray(style))[None]
            self.style_tgts = losses.style_targets(self.vgg_params, pre, self.percep_cfg)

        # image model for frame-1 stylization ('' => none, 'self' => recurrent)
        self.image_model: Optional[Tuple[arch_dsl.ModelSpec, dict]] = image_model

        # model params
        self.key, k = jax.random.split(self.key)
        self.params = stylizer.init_params(k, self.spec)
        self.lr_sched = parse_lr_schedule(opt.learning_rate)
        self.frame_steps_sched = parse_iter_schedule(opt.num_frame_steps)
        # NOTE: the reference parses -weight_decay but its application is
        # commented out (train_video.lua:376) — we honor the flag for real.
        def _make_tx(lr):
            if opt.weight_decay:
                return optax.inject_hyperparams(
                    lambda learning_rate: optax.chain(
                        optax.add_decayed_weights(opt.weight_decay),
                        optax.adam(learning_rate),
                    )
                )(learning_rate=lr)
            return optax.inject_hyperparams(optax.adam)(learning_rate=lr)

        self.tx = _make_tx(self.lr_sched[0][1])
        self.opt_state = self.tx.init(self.params)
        # Commit params/optimizer replicated over the data mesh from the
        # start. Fresh-init and checkpoint-restored runs then present the
        # SAME input shardings to the jitted step — identical compiled
        # programs, hence the bit-identical elastic-resume guarantee
        # (tests/test_parallel.py failure drill); uncommitted init leaves
        # let XLA pick a different layout than a restored committed tree.
        rep = pmesh.replicated(self.mesh)
        self.params = jax.device_put(self.params, rep)
        self.opt_state = jax.device_put(self.opt_state, rep)
        self.iteration = 0

        # data mix
        self.mix = parse_data_mix(opt.data_mix)
        self.wheel = data_mix_wheel(self.mix)
        h, w = (int(v) for v in opt.train_img_size.split(":"))
        self.train_hw = (h, w)
        # multi-host: batch_size is GLOBAL; each process loads its own rows
        # (contiguous dataset shard) and put_global_batch assembles the
        # sharded global arrays. Single-process: degenerates to the
        # whole dataset and a plain device_put.
        nproc = jax.process_count()
        if opt.batch_size % nproc:
            raise ValueError(
                f"batch_size {opt.batch_size} not divisible by "
                f"process_count {nproc}")
        local_bs = opt.batch_size // nproc
        shard_kw = dict(num_shards=nproc, shard_index=jax.process_index())
        self.image_source = (
            data_mod.H5ImageSource(opt.h5_file, local_bs, out_hw=(h, w),
                                   max_train=opt.max_train, **shard_kw)
            if opt.h5_file
            else None
        )
        self.video_source = (
            data_mod.H5VideoSource(opt.h5_file_video, local_bs,
                                   max_train=opt.max_train, **shard_kw)
            if opt.h5_file_video
            else None
        )
        self.data_rng = np.random.default_rng(opt.seed + 1)

        # histories (train_video.lua:382-394)
        self.train_loss_history: List[float] = []
        self.val_loss_history: List[float] = []
        self.val_loss_last_history: List[float] = []
        self.val_loss_history_ts: List[int] = []
        self.percept_loss_history: Dict[str, List[float]] = {}
        self._loss_accum: Dict[str, float] = {}
        self._total_accum = 0.0

        self._step_cache: Dict[Tuple, callable] = {}
        self._dtype = jnp.bfloat16 if opt.dtype == "bfloat16" else jnp.float32

    # ------------------------------------------------------------------
    # device step
    # ------------------------------------------------------------------

    def _loss_fn(self, params, imgs, flows, certs, key, num_steps: int,
                 first_mode: str, all_steps: bool = False):
        """imgs: tuple of num_steps+1 (N, H, W, 3) VGG-space arrays (shapes
        may differ per step — the vr source's frame 1 is a border strip);
        flows: tuple of (N, Hf, Wf, 2); certs: tuple of (N, Hf, Wf, 1).
        Reference closure f (:245-379)."""
        opt = self.opt
        n, h, w = imgs[-1].shape[0], imgs[-1].shape[1], imgs[-1].shape[2]
        certs = tuple(filters.min_filter(c, opt.reliable_map_min_filter) for c in certs)

        def model_fwd(p, x):
            return stylizer.apply(p, self.spec, x.astype(self._dtype)).astype(jnp.float32)

        # frame 1 (:276-285) — never on the gradient path
        h0, w0 = imgs[0].shape[1], imgs[0].shape[2]
        if first_mode == "zeros":
            out1 = jnp.zeros((n, h0, w0, 3), jnp.float32)
        elif first_mode == "image_model":
            spec_i, params_i = self.image_model
            out1 = stylizer.apply(params_i, spec_i, imgs[0].astype(self._dtype)).astype(
                jnp.float32
            )
        else:  # 'self': the video model with zero prior + zero certainty
            x0 = jnp.concatenate(
                [imgs[0], jnp.zeros((n, h0, w0, 4), imgs[0].dtype)], axis=-1
            )
            out1 = model_fwd(params, x0)
        out1 = jax.lax.stop_gradient(out1)

        out2 = None
        out1_warped_masked = None
        step_losses = []  # per-step (pixel + percep), for validation parity
        for i in range(num_steps):
            if out2 is not None:
                out1 = out2 if opt.full_bptt else jax.lax.stop_gradient(out2)
            cert3 = jnp.broadcast_to(certs[i], (n, h, w, 1))
            out1_warped = warp.bilinear_warp(out1, flows[i])
            out1_warped_masked = out1_warped * cert3
            key, sub = jax.random.split(key)
            antimask = self._antimask(sub, cert3, (n, h, w, 3))
            x = jnp.concatenate(
                [imgs[i + 1], out1_warped_masked + antimask, certs[i]], axis=-1
            )
            out2 = model_fwd(params, x)
            if all_steps:
                # validation scores every unrolled step (train_video.lua:473-494)
                sl = jnp.asarray(0.0, jnp.float32)
                if opt.pixel_loss_weight > 0:
                    sl = sl + opt.pixel_loss_weight * losses.pixel_loss(
                        opt.pixel_loss_type, out2 * certs[i], out1_warped_masked
                    )
                if opt.percep_loss_weight > 0 and self.style_tgts is not None:
                    pstep, _ = losses.perceptual_loss(
                        self.vgg_params, out2, imgs[i + 1], self.style_tgts,
                        self.percep_cfg,
                    )
                    sl = sl + opt.percep_loss_weight * pstep
                step_losses.append(sl)

        cert_last = certs[num_steps - 1]
        out2_masked = out2 * cert_last

        total = jnp.asarray(0.0, jnp.float32)
        aux: Dict[str, jnp.ndarray] = {}
        if opt.percep_loss_weight > 0 and self.style_tgts is not None:
            ploss, per_layer = losses.perceptual_loss(
                self.vgg_params, out2, imgs[num_steps], self.style_tgts, self.percep_cfg
            )
            total = total + opt.percep_loss_weight * ploss
            aux.update(per_layer)
        if opt.pixel_loss_weight > 0:
            pl = losses.pixel_loss(
                opt.pixel_loss_type, out2_masked, jax.lax.stop_gradient(out1_warped_masked)
            )
            total = total + opt.pixel_loss_weight * pl
            aux["pixel"] = pl
        if opt.tv_strength > 0:
            total = total + tv.tv_loss(out2, opt.tv_strength) / n
        aux["total"] = total
        if all_steps and step_losses:
            aux["val_sum"] = sum(step_losses)
            aux["val_last"] = step_losses[-1]
        return total, (aux, out2, out1_warped_masked)

    def _antimask(self, key, cert3, shape):
        if self.opt.fill_occlusions == "uniform-random":
            rnd = jax.random.uniform(key, shape, jnp.float32)
            return vgg_preprocess(rnd) * (1.0 - jnp.broadcast_to(cert3, shape))
        return jnp.zeros(shape, jnp.float32)

    def _get_step(self, num_steps: int, first_mode: str):
        cache_key = (num_steps, first_mode)
        if cache_key in self._step_cache:
            return self._step_cache[cache_key]

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def step(params, opt_state, imgs, flows, certs, key, lr):
            def wrapped(p):
                return self._loss_fn(p, imgs, flows, certs, key, num_steps, first_mode)

            (loss, (aux, out2, warped)), grads = jax.value_and_grad(
                wrapped, has_aux=True
            )(params)
            opt_state.hyperparams["learning_rate"] = lr
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, aux, out2, warped

        self._step_cache[cache_key] = step
        return step

    # ------------------------------------------------------------------
    # host loop
    # ------------------------------------------------------------------

    def _next_source(self) -> str:
        if self.iteration < self.opt.single_image_until:
            return "single_image"
        return self.wheel[int(self.data_rng.integers(0, len(self.wheel)))]

    def _get_batch(self, split: str, source: str, num_steps: int):
        if source == "video":
            imgs, flows, certs = self.video_source.get_batch(split, num_steps)
        elif source == "vr":
            from . import data_vr

            imgs, flows, certs = data_vr.vr_batch(
                self.image_source.next_images(split), self.data_rng, self.train_hw
            )
            num_steps = 1
        else:
            images = self.image_source.next_images(split)
            if source == "single_image":
                imgs, flows, certs = data_mod.single_image_batch(images, 1, self.data_rng)
                num_steps = 1
            else:
                imgs, flows, certs = data_mod.SYNTHETIC_SOURCES[source](
                    images, num_steps, self.data_rng
                )
        return tuple(imgs), tuple(flows), tuple(certs), num_steps

    def _first_mode(self, source: str) -> str:
        if source == "single_image":
            return "zeros"
        if self.image_model is not None:
            return "image_model"
        return "self"

    def train(self, num_iterations: Optional[int] = None, log_fn=print):
        opt = self.opt
        end = num_iterations or opt.num_iterations
        t_start = time.monotonic()
        while self.iteration < end:
            self.iteration += 1
            t = self.iteration
            lr = schedule_value(self.lr_sched, t)
            if opt.lr_decay_every > 0:
                lr = lr * (opt.lr_decay_factor ** (t // opt.lr_decay_every))
            num_steps = int(schedule_value(self.frame_steps_sched, t))
            source = self._next_source()
            imgs, flows, certs, num_steps = self._get_batch("train", source, num_steps)
            self.key, sub = jax.random.split(self.key)
            step = self._get_step(num_steps, self._first_mode(source))
            batch = pmesh.put_global_batch(self.mesh, (imgs, flows, certs))
            self.params, self.opt_state, loss, aux, out2, warped = step(
                self.params, self.opt_state, *batch, sub, jnp.asarray(lr, jnp.float32)
            )
            loss_val = float(loss)
            self._accumulate(loss_val, aux)
            if t % opt.print_every == 0:
                log_fn(
                    f"Iteration {t} / {end}, loss = {loss_val:.6f} "
                    f"[{source} x{num_steps}] {time.monotonic()-t_start:.1f}s"
                )
            if t % opt.history_every == 0:
                self._flush_history()
            if opt.images_every > 0 and t % opt.images_every == 1:
                self._dump_debug_images(imgs, certs, out2, warped, num_steps)
            if t % opt.checkpoint_every == 0:
                self.validate(log_fn)
                self.save_checkpoint()
        return self

    # ------------------------------------------------------------------

    def _accumulate(self, loss_val: float, aux):
        self._total_accum += loss_val
        for k, v in aux.items():
            if k == "total":
                continue
            self._loss_accum[k] = self._loss_accum.get(k, 0.0) + float(v)

    def _flush_history(self):
        n = self.opt.history_every
        self.train_loss_history.append(self._total_accum / n)
        self._total_accum = 0.0
        for k, v in self._loss_accum.items():
            self.percept_loss_history.setdefault(k, []).append(v / n)
        self._loss_accum = {}

    def validate(self, log_fn=print) -> float:
        """Validation sweep over every data source (train_video.lua:438-504)."""
        opt = self.opt
        if self.image_source:
            self.image_source.reset("val")
        if self.video_source:
            self.video_source.reset("val")
        num_steps = int(self.frame_steps_sched[-1][1])
        val_loss = 0.0
        val_loss_last = 0.0
        denom = sum(self.mix.values())
        for _ in range(opt.num_val_batches):
            part = 0.0
            part_last = 0.0
            for source, weight in self.mix.items():
                steps = num_steps
                imgs, flows, certs, steps = self._get_batch("val", source, steps)
                self.key, sub = jax.random.split(self.key)
                _, aux = _eval_loss(self, imgs, flows, certs, sub, steps,
                                    self._first_mode(source))
                part += weight * float(aux["val_sum"]) / steps
                part_last += weight * float(aux["val_last"])
            val_loss += part / denom
            val_loss_last += part_last / denom
        val_loss /= opt.num_val_batches
        val_loss_last /= opt.num_val_batches
        log_fn(f"val loss = {val_loss:.6f}")
        self.val_loss_history.append(val_loss)
        self.val_loss_last_history.append(val_loss_last)
        self.val_loss_history_ts.append(self.iteration)
        return val_loss

    def _dump_debug_images(self, imgs, certs, out2, warped, num_steps):
        """debug/ dumps every images_every iterations (train_video.lua:303-309).
        Fixed vs reference: dumps land NEXT TO the checkpoint, not in the
        process CWD (the reference's bare 'debug/' littered whatever
        directory training ran from)."""
        base_dir = os.path.dirname(self.opt.checkpoint_name)
        d = os.path.join(base_dir, "debug") if base_dir else "debug"
        os.makedirs(d, exist_ok=True)
        def dep(x):
            return np.clip(np.asarray(vgg_deprocess(jnp.asarray(x))), 0, 1)
        core_io.save_image(f"{d}/in{num_steps+1}.png", dep(imgs[num_steps][0]))
        core_io.save_image(f"{d}/out{num_steps+1}.png", dep(np.asarray(out2)[0]))
        core_io.save_image(f"{d}/out{num_steps}_warped_masked.png", dep(np.asarray(warped)[0]))
        core_io.save_image(f"{d}/mask{num_steps}.png", np.asarray(certs[num_steps-1][0]))

    # ------------------------------------------------------------------
    # checkpointing (JSON history + portable model, train_video.lua:507-541)
    # ------------------------------------------------------------------

    def save_checkpoint(self):
        opt = self.opt
        base = opt.checkpoint_name
        d = os.path.dirname(base)
        if d:
            os.makedirs(d, exist_ok=True)
        # multi-host: the orbax save below is COLLECTIVE (every process
        # participates), but the history JSON and the model .npz are plain
        # single-file writes of replicated values — only process 0 writes
        # them (two processes racing on one path corrupts it); the RNG/cursor
        # sidecars are per-process by name (_rng_sidecar_suffix)
        primary = jax.process_index() == 0
        history = {
            "opt": dataclasses.asdict(opt),
            "train_loss_history": self.train_loss_history,
            "val_loss_history": self.val_loss_history,
            "val_loss_last_history": self.val_loss_last_history,
            "val_loss_history_ts": self.val_loss_history_ts,
            "percept_loss_history": self.percept_loss_history,
            "iter": self.iteration,
        }
        if primary:
            with open(base + ".json", "w") as f:
                json.dump(history, f)
        num_steps = int(schedule_value(self.frame_steps_sched, self.iteration))
        if primary:
            model_ckpt.save_model(
                f"{base}_{num_steps}.npz",
                self.params,
                {
                    "arch": opt.arch,
                    "in_channels": 7,
                    "padding_type": opt.padding_type,
                    "use_instance_norm": opt.use_instance_norm,
                    "tanh_constant": opt.tanh_constant,
                    "iter": self.iteration,
                },
            )
        # full training state (optimizer included — the reference drops it,
        # README.md:270; we keep it)
        self._save_train_state(base + "_state")

    def _save_train_state(self, path: str):
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(
            os.path.abspath(path) + ".orbax",
            {"params": self.params, "opt_state": self.opt_state,
             "iteration": self.iteration},
            force=True,
        )
        ckptr.wait_until_finished()
        # RNG streams + data cursors, so a restored run replays the EXACT
        # iteration sequence an uninterrupted run would have produced
        # (elastic resume drill: tests/test_train.py). The 128-bit PCG64
        # state ints don't fit orbax leaves — side JSON with decimal
        # strings.
        st = self.data_rng.bit_generator.state
        side = {
            "key": np.asarray(self.key).tolist(),
            "rng_state": str(st["state"]["state"]),
            "rng_inc": str(st["state"]["inc"]),
            "rng_has_uint32": int(st["has_uint32"]),
            "rng_uinteger": int(st["uinteger"]),
            "image_cursor": self.image_source.cursor if self.image_source else None,
            "video_cursor": self.video_source.cursor if self.video_source else None,
            # history accumulators (running sums since the last history
            # flush) — without them a resumed run's first history entry
            # averages fewer iterations than the uninterrupted run's
            "total_accum": self._total_accum,
            "loss_accum": self._loss_accum,
        }
        with open(path + _rng_sidecar_suffix(), "w") as f:
            json.dump(side, f)

    def restore_train_state(self, path: str):
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        target = {"params": self.params, "opt_state": self.opt_state,
                  "iteration": 0}
        state = ckptr.restore(os.path.abspath(path) + ".orbax", target)
        # Orbax hands back arrays COMMITTED to their restore device; re-place
        # them replicated over this trainer's mesh so the restored run can
        # continue on a mesh of any size (elastic failure drill,
        # tests/test_parallel.py) instead of erroring on mixed device sets.
        rep = pmesh.replicated(self.mesh)
        self.params = jax.device_put(state["params"], rep)
        self.opt_state = jax.device_put(state["opt_state"], rep)
        self.iteration = int(state["iteration"])
        if self.video_source:
            self.video_source.set_cursor_from_iteration("train", self.iteration + 1)
        # Per-process sidecar first (multi-host: each host's data cursors are
        # its own shard's, a shared file would be last-writer-wins), then the
        # legacy shared name for pre-round-3 checkpoints.
        side_path = path + _rng_sidecar_suffix()
        if not os.path.exists(side_path):
            side_path = path + ".rng.json"
        if os.path.exists(side_path):
            with open(side_path) as f:
                side = json.load(f)
            self.key = jnp.asarray(np.asarray(side["key"], np.uint32))
            st = self.data_rng.bit_generator.state
            st["state"]["state"] = int(side["rng_state"])
            st["state"]["inc"] = int(side["rng_inc"])
            st["has_uint32"] = side["rng_has_uint32"]
            st["uinteger"] = side["rng_uinteger"]
            self.data_rng.bit_generator.state = st
            if self.image_source and side["image_cursor"] is not None:
                self.image_source.cursor = side["image_cursor"]
            if self.video_source and side["video_cursor"] is not None:
                self.video_source.cursor = side["video_cursor"]
            self._total_accum = side.get("total_accum", 0.0)
            self._loss_accum = dict(side.get("loss_accum", {}))
        # loss histories live in the sibling "<base>.json" written by
        # save_checkpoint (path is "<base>_state") — without this a resumed
        # run's final history JSON silently drops every pre-interrupt entry
        if path.endswith("_state"):
            hist_path = path[: -len("_state")] + ".json"
            if os.path.exists(hist_path):
                with open(hist_path) as f:
                    hist = json.load(f)
                for k in ("train_loss_history", "val_loss_history",
                          "val_loss_last_history", "val_loss_history_ts",
                          "percept_loss_history"):
                    if k in hist:
                        setattr(self, k, hist[k])
        return self


def _rng_sidecar_suffix() -> str:
    """Process 0 keeps the legacy shared ".rng.json" name (single-host
    checkpoints stay compatible); other hosts write ".rng.p{i}.json" so
    per-host data cursors never collide under multi-host training."""
    idx = jax.process_index()
    return ".rng.json" if idx == 0 else f".rng.p{idx}.json"


def _eval_loss(trainer: Trainer, imgs, flows, certs, key, num_steps, first_mode):
    # Cached per trainer INSTANCE (a module-level dict keyed on id(trainer)
    # can hand a new trainer a stale jit closed over a garbage-collected
    # trainer's spec once CPython reuses the id).
    cache = getattr(trainer, "_eval_cache", None)
    if cache is None:
        cache = trainer._eval_cache = {}
    cache_key = (num_steps, first_mode)
    fn = cache.get(cache_key)
    if fn is None:
        fn = jax.jit(
            functools.partial(trainer._loss_fn, num_steps=num_steps,
                              first_mode=first_mode, all_steps=True)
        )
        cache[cache_key] = fn
    loss, (aux, _, _) = fn(
        trainer.params,
        tuple(jnp.asarray(a) for a in imgs),
        tuple(jnp.asarray(a) for a in flows),
        tuple(jnp.asarray(a) for a in certs),
        key,
    )
    return loss, aux


def _scale_shorter_side(img: np.ndarray, size: int) -> np.ndarray:
    """Torch image.scale(img, size) semantics: scale so the SHORTER side
    equals size (used for the style image, train_video.lua:143-144)."""
    import jax

    h, w = img.shape[:2]
    if h < w:
        nh, nw = size, max(1, round(w * size / h))
    else:
        nh, nw = max(1, round(h * size / w)), size
    out = jax.image.resize(jnp.asarray(img), (nh, nw, img.shape[2]), method="bilinear")
    return np.asarray(out)
