"""Data-parallel training loop for the learned frontend.

The TPU re-design of `SemanticSLAMTrainer` (`semantic-slam/train.py:38-601`):

- one **jitted train step** over a ``('data', 'model')`` mesh — batch
  sharded on 'data', params replicated; the gradient all-reduce is the
  only collective and XLA inserts it (SURVEY.md §2.3 consequence (a));
- frozen ViT backbone / trainable {selector, refiner, estimator} split,
  mirroring the reference's optimizer param list (`train.py:117-121`)
  plus the uncertainty head the reference never wired in;
- AdamW + cosine LR (lr -> lr_min, `train.py:117-128`) with the
  configured-but-unimplemented warmup actually implemented, global-norm
  grad clip 1.0 (`train.py:240-243`);
- NaN handling as a *step-level mask*: a non-finite loss or gradient
  leaves params untouched (the jit-compatible form of the reference's
  batch skip, `train.py:233-235`);
- in-training mutual-NN matching on device (`train.py:410-449`, no
  per-image loops);
- orbax checkpointing with true resume (step/params/opt state/PRNG) and
  best-by-val-loss retention — the reference writes best only and has
  no resume path (SURVEY.md §5 Checkpoint/resume).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from pathlib import Path
from typing import Any, Callable, Dict, Iterator, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import optax

from ..losses import self_supervised as losses
from ..models import uncertainty
from ..models.frontend import LearnedFrontend
from ..models.selector import select_keypoints
from ..ops import matching
from ..parallel import mesh as mesh_lib, tp
from .config import Config

TRAINABLE = ("selector", "refiner", "estimator", "offset_head")
TRAINABLE_WITH_BACKBONE = TRAINABLE + ("backbone",)


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    trainable: Any  # params of selector/refiner/estimator
    frozen: Any  # backbone params
    batch_stats: Any
    opt_state: Any
    rng: jax.Array


def split_params(params: Dict, keys: Tuple[str, ...] = TRAINABLE) -> Tuple[Dict, Dict]:
    trainable = {k: params[k] for k in params if k in keys}
    frozen = {k: params[k] for k in params if k not in keys}
    return trainable, frozen


def merge_params(trainable: Dict, frozen: Dict) -> Dict:
    return {**trainable, **frozen}


def build_model(cfg: Config) -> LearnedFrontend:
    m = cfg.model
    return LearnedFrontend(
        embed_dim=m.backbone_dim,
        depth=m.backbone_depth,
        num_heads=m.backbone_heads,
        pos_grid=m.backbone_pos_grid,
        selector_hidden=m.selector_hidden,
        refiner_hidden=m.refiner_hidden,
        refiner_layers=m.refiner_layers,
        descriptor_dim=m.descriptor_dim,
        estimator_hidden=m.estimator_hidden,
        num_keypoints=m.num_keypoints,
        subpatch_refine=m.subpatch_refine,
    )


def build_optimizer(cfg: Config, steps_per_epoch: int) -> optax.GradientTransformation:
    t = cfg.training
    total_steps = max(t.epochs * steps_per_epoch, 2)
    # optax runs cosine decay over (decay_steps - warmup_steps); clamp the
    # warmup so short runs (few epochs) keep a positive decay span.
    warmup = min(t.warmup_epochs * steps_per_epoch, total_steps - 1)
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0 if warmup > 0 else t.lr,
        peak_value=t.lr,
        warmup_steps=max(warmup, 1),
        decay_steps=total_steps,
        end_value=t.lr_min,
    )
    return optax.chain(
        optax.clip_by_global_norm(t.grad_clip),
        optax.adamw(schedule, weight_decay=t.weight_decay),
    )


def create_train_state(
    cfg: Config, steps_per_epoch: int, rng: Optional[jax.Array] = None
) -> Tuple[LearnedFrontend, TrainState]:
    model = build_model(cfg)
    rng = jax.random.PRNGKey(cfg.training.seed) if rng is None else rng
    rng, init_rng = jax.random.split(rng)
    size = cfg.model.input_size
    variables = model.init(init_rng, jnp.zeros((1, size, size, 3)))
    keys = (
        TRAINABLE_WITH_BACKBONE if cfg.training.train_backbone else TRAINABLE
    )
    trainable, frozen = split_params(variables["params"], keys)
    tx = build_optimizer(cfg, steps_per_epoch)
    return model, TrainState(
        step=jnp.asarray(0, jnp.int32),
        trainable=trainable,
        frozen=frozen,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(trainable),
        rng=rng,
    )


def _forward_pair(
    model: LearnedFrontend, variables, rgb1, rgb2, cfg: Config, extras=None
):
    """The reference's `_forward_pass` (`train.py:292-408`) as one pure
    function: features, saliency, fixed-K keypoints, descriptors,
    mutual-NN matches, weighted loss bundle.

    ``extras`` (optional): {'depth1': (B,H,W) m, 'K': (3,3)|(B,3,3),
    'rel_pose': (B,4,4) T_2<-1} enables the warp-consistency
    localization loss when ``subpatch_refine`` is on and
    ``loss.weights.localization`` > 0."""

    def run(images, mutable):
        return model.apply(
            variables,
            images,
            train=True,
            mutable=mutable,
            method=LearnedFrontend.features_and_saliency,
        )

    (feats1, sal1), updates = run(rgb1, ["batch_stats"])
    vars2 = {**variables, **updates}
    (feats2, sal2), updates2 = model.apply(
        vars2, rgb2, train=True, mutable=["batch_stats"],
        method=LearnedFrontend.features_and_saliency,
    )
    vars3 = {**variables, **updates2}

    kp1 = select_keypoints(sal1, cfg.model.num_keypoints)
    kp2 = select_keypoints(sal2, cfg.model.num_keypoints)
    xy1, xy2 = kp1.xy, kp2.xy
    if cfg.model.subpatch_refine:
        # OffsetHead positions, trained ONLY by localization_loss below;
        # descriptors sample the refined positions under stop-gradient
        # (see models.frontend.LearnedFrontend.__call__).
        xy1 = model.apply(
            vars3, feats1, sal1, rgb1, kp1.xy, method=LearnedFrontend.refine_at
        )
        xy2 = model.apply(
            vars3, feats2, sal2, rgb2, kp2.xy, method=LearnedFrontend.refine_at
        )

    _, desc1, conf1 = model.apply(
        vars3, feats1, jax.lax.stop_gradient(xy1),
        method=LearnedFrontend.describe_at,
    )
    _, desc2, _ = model.apply(
        vars3, feats2, jax.lax.stop_gradient(xy2),
        method=LearnedFrontend.describe_at,
    )

    m = matching.match_cosine(desc1, desc2, kp1.valid, kp2.valid, ratio=None)
    use_gt = getattr(cfg.loss, "gt_supervision", False) and extras is not None
    if use_gt:
        # GT-warp positives (synthetic recipe; LossConfig.gt_supervision):
        # in-training mutual-NN bootstrapping self-reinforces
        # lookalike-texture mismatches when the backbone trains from
        # scratch — see the config field's rationale.
        from ..models.backbone import patch_to_pixel as _p2p

        ps_ = model.patch_size
        use_hard = getattr(cfg.loss, "hard_negatives", False)
        gt = losses.gt_match_pairs(
            _p2p(jax.lax.stop_gradient(xy1), ps_),
            _p2p(jax.lax.stop_gradient(xy2), ps_),
            kp1.valid,
            kp2.valid,
            extras["depth1"],
            extras["K"],
            extras["rel_pose"],
            K2=extras.get("K2"),
            radius=cfg.loss.gt_match_radius,
            safe_radius=cfg.loss.safe_radius if use_hard else None,
        )
        pairs, pair_valid = gt[0], gt[1]
        neg_ok = gt[2] if use_hard else None
        loc_idx2, loc_valid = pairs[..., 1], pair_valid
    else:
        pairs, pair_valid = matching.matches_to_pairs(m, cfg.model.num_keypoints)
        neg_ok = None
        loc_idx2, loc_valid = m.idx2, m.valid & kp1.valid

    bundle = losses.total_loss(
        desc1,
        desc2,
        pairs,
        pair_valid,
        sal1,
        sal2,
        rgb1,
        weights=cfg.loss.weights,
        temperature=cfg.loss.desc_temperature,
        target_variance=cfg.loss.target_variance,
        target_mean=cfg.loss.sparsity_target,
        sparsity_penalty=cfg.loss.sparsity_penalty,
        neg_ok=neg_ok,
        valid2=kp2.valid if neg_ok is not None else None,
        cross_image=getattr(cfg.loss, "cross_image_negatives", True),
        hard_margin=getattr(cfg.loss, "hard_margin", 0.2),
    )

    # Uncertainty-head supervision (round-1 gap: the estimator received
    # zero gradient). Matching error of each frame-1 keypoint = 1 - cosine
    # similarity of its mutual-NN match; confidence is trained to predict
    # it (calibration MSE + expected-error L1,
    # reference `uncertainty_estimator.py:69-121`).
    match_err = jnp.clip(1.0 - m.score, 0.0, 2.0)
    conf_valid = m.valid & kp1.valid
    cal = uncertainty.calibration_loss(conf1[..., None], match_err, conf_valid)
    ee = uncertainty.expected_error_loss(conf1[..., None], match_err, conf_valid)
    w = cfg.loss.weights
    extra = (
        w.get("calibration", 0.3) * cal + w.get("expected_error", 0.02) * ee
    )
    comps = {**bundle.components, "calibration": cal, "expected_error": ee}

    # Warp-consistency localization (TPU-build extension; see
    # losses.localization_loss). Only meaningful with sub-patch
    # refinement — without it positions carry no gradient.
    loc_w = w.get("localization", 0.0)
    if loc_w and cfg.model.subpatch_refine and extras is not None:
        from ..models.backbone import patch_to_pixel

        ps = model.patch_size
        uv1 = patch_to_pixel(xy1, ps)
        uv2 = patch_to_pixel(xy2, ps)
        uv2_matched = jnp.take_along_axis(
            uv2, loc_idx2[..., None], axis=1
        )
        loc = losses.localization_loss(
            uv1,
            uv2_matched,
            loc_valid,
            extras["depth1"],
            extras["K"],
            extras["rel_pose"],
            # True correspondence error is bounded by flow + the crop
            # jitter (up to one patch pitch of sub-patch phase); larger
            # residuals are descriptor mismatches.
            max_residual=12.0,
            K2=extras.get("K2"),
        )
        loc = jnp.where(jnp.isfinite(loc), loc, 0.0)
        extra = extra + loc_w * loc
        comps["localization"] = loc

    bundle = losses.LossBundle(
        total=bundle.total + jnp.where(jnp.isfinite(extra), extra, 0.0),
        components=comps,
    )
    metrics = {
        "num_matches": jnp.mean(m.count().astype(jnp.float32)),
        "mean_saliency": jnp.mean(sal1),
        "max_saliency": jnp.max(sal1),
        "saliency_variance": jnp.var(sal1),
        "descriptor_variance": jnp.var(desc1),
    }
    return bundle, metrics, updates2.get("batch_stats", {})


def make_train_step(
    model: LearnedFrontend, cfg: Config, tx: optax.GradientTransformation,
    mesh=None,
):
    """Build the jitted train step; with a mesh, batch inputs are expected
    sharded on 'data' and the step is jitted with replicated state."""

    def train_step(state: TrainState, batch) -> Tuple[TrainState, Dict]:
        rgb1, rgb2 = batch["rgb1"], batch["rgb2"]

        def loss_fn(trainable):
            variables = {
                "params": merge_params(trainable, state.frozen),
                "batch_stats": state.batch_stats,
            }
            bundle, metrics, new_bs = _forward_pair(
                model, variables, rgb1, rgb2, cfg,
                extras=batch if "rel_pose" in batch else None,
            )
            return bundle.total, (bundle, metrics, new_bs)

        (loss, (bundle, metrics, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.trainable)

        # Step-level NaN guard == the reference's batch skip (train.py:233).
        grads_finite = jax.tree.reduce(
            lambda a, g: a & jnp.all(jnp.isfinite(g)),
            grads,
            jnp.asarray(True),
        )
        ok = jnp.isfinite(loss) & grads_finite

        updates, new_opt = tx.update(grads, state.opt_state, state.trainable)
        new_trainable = optax.apply_updates(state.trainable, updates)

        def pick(new, old):
            return jax.tree.map(lambda n, o: jnp.where(ok, n, o), new, old)

        state = dataclasses.replace(
            state,
            step=state.step + 1,
            trainable=pick(new_trainable, state.trainable),
            opt_state=pick(new_opt, state.opt_state),
            batch_stats=pick(new_bs, state.batch_stats) if new_bs else state.batch_stats,
        )
        out = {
            "loss": loss,
            "skipped": ~ok,
            **{k: v for k, v in bundle.components.items()},
            **metrics,
        }
        return state, out

    # Shardings are carried by the arguments themselves (state leaves are
    # device_put with TP/replicated shardings by `parallel.tp.shard_tree`,
    # batches by `parallel.mesh.shard_batch`); jit propagates them, and the
    # unused ``mesh`` parameter is kept for call-site symmetry.
    del mesh
    return jax.jit(train_step, donate_argnums=(0,))


def make_eval_step(model: LearnedFrontend, cfg: Config, mesh=None):
    def eval_step(state: TrainState, batch) -> Dict:
        variables = {
            "params": merge_params(state.trainable, state.frozen),
            "batch_stats": state.batch_stats,
        }
        bundle, metrics, _ = _forward_pair(
            model, variables, batch["rgb1"], batch["rgb2"], cfg,
            extras=batch if "rel_pose" in batch else None,
        )
        return {"loss": bundle.total, **bundle.components, **metrics}

    del mesh
    return jax.jit(eval_step)


# ---------------------------------------------------------------------------
# Checkpointing (orbax): true resume — step, params, opt state, PRNG.
# ---------------------------------------------------------------------------


def save_checkpoint(
    path: str | Path,
    state: TrainState,
    metadata: Dict | None = None,
    params_only: bool = False,
):
    """``params_only=True`` drops the optimizer state and PRNG (~3x
    smaller on Adam) — for committed inference artifacts; such a
    checkpoint restores for inference/eval but cannot resume training."""
    import json

    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    ckptr = ocp.StandardCheckpointer()
    payload = {
        "step": state.step,
        "trainable": state.trainable,
        "frozen": state.frozen,
        "batch_stats": state.batch_stats,
    }
    if not params_only:
        payload["opt_state"] = state.opt_state
        payload["rng"] = state.rng
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    meta = dict(metadata or {})
    meta["params_only"] = params_only
    (path.parent / (path.name + ".meta.json")).write_text(json.dumps(meta))


def restore_checkpoint(path: str | Path, state: TrainState) -> Tuple[TrainState, Dict]:
    """Restore into the structure of ``state`` (shapes must match).

    Params-only checkpoints (see :func:`save_checkpoint`) restore
    everything but the optimizer state and PRNG, which keep the values
    already in ``state``."""
    import json

    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    meta_path = path.parent / (path.name + ".meta.json")
    meta = {}
    if meta_path.exists():
        meta = json.loads(meta_path.read_text())

    ckptr = ocp.StandardCheckpointer()
    template = {
        "step": state.step,
        "trainable": state.trainable,
        "frozen": state.frozen,
        "batch_stats": state.batch_stats,
    }
    if not meta.get("params_only", False):
        template["opt_state"] = state.opt_state
        template["rng"] = state.rng
    restored = ckptr.restore(path, target=template)
    return dataclasses.replace(state, **restored), meta


# ---------------------------------------------------------------------------
# Fit loop
# ---------------------------------------------------------------------------


def fit(
    cfg: Config,
    train_batches: Callable[[int], Iterator[Dict]],
    val_batches: Optional[Callable[[], Iterator[Dict]]] = None,
    steps_per_epoch: int = 16,
    log_fn: Callable[[Dict], None] = lambda m: None,
    init_from: str | Path | None = None,
    resume_from: str | Path | None = None,
) -> Tuple[TrainState, Dict]:
    """Epoch loop with best-checkpoint retention.

    ``train_batches(epoch)`` yields host batches (dicts of numpy arrays
    with at least rgb1/rgb2); sharding + device transfer happen here.
    ``init_from`` warm-starts params/batch-stats from a checkpoint
    (params-only accepted) with a FRESH optimizer and LR schedule —
    a cosine warm restart, not a resume (step resets to 0).
    ``resume_from`` is a TRUE resume from a full-state checkpoint
    (step + optimizer state + PRNG restored; the LR schedule continues
    from the restored optax count) picking the epoch loop back up at the
    checkpoint's recorded epoch + 1 — the interrupted-run path the
    reference lacks (SURVEY.md §5 Checkpoint/resume)."""
    t = cfg.training
    mesh = mesh_lib.make_mesh(t.mesh_data, t.mesh_model)
    model, state = create_train_state(cfg, steps_per_epoch)
    best_val = float("inf")
    start_epoch = 1
    if resume_from is not None:
        state, meta = restore_checkpoint(resume_from, state)
        if meta.get("params_only", False):
            raise ValueError(
                f"{resume_from} is a params-only checkpoint; true resume "
                "needs the optimizer state (use init_from to warm-start)"
            )
        start_epoch = int(meta.get("epoch", 0)) + 1
        best_val = float(meta.get("val_loss", float("inf")))
    elif init_from is not None:
        restored, _ = restore_checkpoint(init_from, state)
        state = dataclasses.replace(
            state,
            trainable=restored.trainable,
            frozen=restored.frozen,
            batch_stats=restored.batch_stats,
        )
    state = tp.shard_tree(state, mesh)
    tx = build_optimizer(cfg, steps_per_epoch)
    train_step = make_train_step(model, cfg, tx, mesh)
    eval_step = make_eval_step(model, cfg, mesh)

    history = {"train": [], "val": []}
    save_dir = Path(t.save_dir)

    for epoch in range(start_epoch, t.epochs + 1):
        agg: Dict[str, float] = {}
        n = 0
        for batch in train_batches(epoch):
            batch = mesh_lib.shard_batch(mesh, batch)
            state, out = train_step(state, batch)
            out = jax.device_get(out)
            for k, v in out.items():
                agg[k] = agg.get(k, 0.0) + float(v)
            n += 1
        train_metrics = {k: v / max(n, 1) for k, v in agg.items()}
        train_metrics["epoch"] = epoch
        history["train"].append(train_metrics)
        log_fn({"split": "train", **train_metrics})

        if val_batches is not None and epoch % t.val_interval == 0:
            vagg: Dict[str, float] = {}
            vn = 0
            for batch in val_batches():
                batch = mesh_lib.shard_batch(mesh, batch)
                out = jax.device_get(eval_step(state, batch))
                for k, v in out.items():
                    vagg[k] = vagg.get(k, 0.0) + float(v)
                vn += 1
            val_metrics = {k: v / max(vn, 1) for k, v in vagg.items()}
            val_metrics["epoch"] = epoch
            history["val"].append(val_metrics)
            log_fn({"split": "val", **val_metrics})

            if val_metrics.get("loss", float("inf")) < best_val:
                best_val = val_metrics["loss"]
                save_checkpoint(
                    save_dir / "best_model",
                    jax.device_get(state),
                    metadata={"epoch": epoch, "val_loss": best_val},
                )
    return state, history
