"""HULC model assembly: CVAE policy with latent plans + language aux losses.

Reference behavior: hulc/models/hulc.py (class Hulc, training/validation/
inference logic) and hulc/models/gcbc.py (GCBC = empty plan, no KL).

TPU-first redesign decisions:
  * pure functions everywhere — RNG keys are threaded explicitly; the
    decoder's closed-loop hidden state is an explicit carry;
  * the dual-modality (vis/lang) batch is a fixed pytree structure so one
    jitted train step covers both (reference loops over a dict of batches,
    hulc.py:433);
  * the language auxiliary losses use static-shape masking instead of
    boolean indexing — the reference's DDP "dummy forward" hack
    (hulc.py:584-594) disappears, as predicted in SURVEY.md §2.5;
  * the masked CLIP loss is exactly equivalent to subset selection: invalid
    columns are -inf'd out of the softmax and invalid rows dropped from the
    mean, preserving the diagonal-label correspondence.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from hulc_tpu.config import HulcConfig
from hulc_tpu.models.aux_heads import BCZLangDecoder, MIALangDiscriminator, ProjVisLang
from hulc_tpu.models.decoders import make_action_decoder
from hulc_tpu.models.goal_encoders import GoalEncoder, make_language_goal_encoder
from hulc_tpu.models.perceptual import ConcatEncoders
from hulc_tpu.models.plan_nets import (
    PlanProposalNetwork,
    make_plan_distribution,
    make_plan_recognition,
)
from hulc_tpu.ops.plan_distributions import PlanState

Array = jax.Array


class ModalityBatch(NamedTuple):
    """One modality's training batch (reference schema, hulc.py:390-414).

    Images are already-preprocessed float NHWC sequences; augmentation runs
    in the input stage (ops.image_ops) so the model is deterministic given
    its inputs.
    """

    rgb_static: Optional[Array]  # (B, S, H, W, 3); None in state_only configs
    rgb_gripper: Optional[Array]  # (B, S, h, w, 3)
    robot_obs: Array  # (B, S, n_state) normalized proprio
    actions: Array  # (B, S, 7) rel or abs actions
    state_info_robot_obs: Array  # (B, S, 15) unnormalized (TCP frame math)
    lang: Optional[Array] = None  # (B, 384) language embedding
    use_for_aux_lang_loss: Optional[Array] = None  # (B,) bool
    idx: Optional[Array] = None  # (B,) episode indices
    depth_static: Optional[Array] = None
    depth_gripper: Optional[Array] = None
    rgb_tactile: Optional[Array] = None

    # Fields that describe the language half only when two modality batches
    # are fused into one [vis; lang] 2B batch; every other field is per-frame
    # data that both fusion paths (CombinedLoader.fuse_batch host-side, the
    # in-graph concat in _fused_train_losses) row-stack. Owned by the schema
    # so the two paths can never diverge when a field is added.
    LANG_ONLY_FIELDS = ("lang", "use_for_aux_lang_loss", "idx")

    def rgb_obs(self) -> Dict[str, Array]:
        d = {}
        if self.rgb_static is not None:
            d["rgb_static"] = self.rgb_static
        if self.rgb_gripper is not None:
            d["rgb_gripper"] = self.rgb_gripper
        if self.rgb_tactile is not None:
            d["rgb_tactile"] = self.rgb_tactile
        return d

    def depth_obs(self) -> Dict[str, Array]:
        d = {}
        if self.depth_static is not None:
            d["depth_static"] = self.depth_static
        if self.depth_gripper is not None:
            d["depth_gripper"] = self.depth_gripper
        return d


def masked_clip_loss(
    image_features: Array, text_features: Array, logit_scale: Array, mask: Optional[Array]
) -> Array:
    """CLIP symmetric contrastive loss over the masked subset (hulc.py:650-695).

    Equivalent to boolean-subset selection, with static shapes: invalid
    columns get -inf logits (excluded from every softmax denominator) and
    invalid rows contribute zero to the mean. All-invalid mask -> 0.0.
    """
    f32 = jnp.float32
    img = image_features.astype(f32)
    txt = text_features.astype(f32)
    img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
    txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
    logits = logit_scale * img @ txt.T  # (B, B)
    b = logits.shape[0]
    if mask is None:
        mask = jnp.ones((b,), bool)
    mask = mask.astype(bool)
    neg_inf = jnp.asarray(-1e9, f32)
    logits_i = jnp.where(mask[None, :], logits, neg_inf)  # mask text columns
    logits_t = jnp.where(mask[None, :], logits.T, neg_inf)  # mask image columns

    diag = jnp.arange(b)
    logp_i = jax.nn.log_softmax(logits_i, axis=-1)[diag, diag]
    logp_t = jax.nn.log_softmax(logits_t, axis=-1)[diag, diag]
    count = jnp.maximum(jnp.sum(mask), 1)
    loss_i = -jnp.sum(jnp.where(mask, logp_i, 0.0)) / count
    loss_t = -jnp.sum(jnp.where(mask, logp_t, 0.0)) / count
    return jnp.where(jnp.any(mask), (loss_i + loss_t) / 2.0, 0.0)


def masked_bc_z_loss(lang_pred: Array, gt_lang: Array, mask: Optional[Array]) -> Array:
    """Cosine-distance regression over the masked subset (hulc.py:567-604)."""
    f32 = jnp.float32
    pred = lang_pred.astype(f32)
    gt = gt_lang.astype(f32)
    cos = jnp.sum(pred * gt, -1) / (
        jnp.linalg.norm(pred, axis=-1) * jnp.linalg.norm(gt, axis=-1) + 1e-8
    )
    dist = 1.0 - cos
    if mask is None:
        return jnp.mean(dist)
    mask = mask.astype(bool)
    count = jnp.maximum(jnp.sum(mask), 1)
    return jnp.where(jnp.any(mask), jnp.sum(jnp.where(mask, dist, 0.0)) / count, 0.0)


class HulcModel(nn.Module):
    """The policy. model_kind="gcbc" degenerates to plan-free BC."""

    cfg: HulcConfig

    def setup(self):
        cfg = self.cfg
        dtype = cfg.dtype
        self.perceptual_encoder = ConcatEncoders(cfg.perceptual_encoder, dtype)
        self.dist = make_plan_distribution(cfg.distribution)
        self.plan_proposal = PlanProposalNetwork(cfg.plan_proposal, self.dist, dtype)
        self.plan_recognition = make_plan_recognition(
            cfg.plan_recognition, self.dist, dtype, "plan_recognition"
        )
        self.visual_goal = GoalEncoder(cfg.visual_goal, dtype=dtype, name="visual_goal")
        self.language_goal = (
            make_language_goal_encoder(cfg.language_goal, dtype, "language_goal")
            if cfg.language_goal
            else None
        )
        self.action_decoder = make_action_decoder(cfg.action_decoder, dtype, "action_decoder")
        if cfg.use_clip_auxiliary_loss or cfg.use_mia_auxiliary_loss:
            self.proj_vis_lang = ProjVisLang(cfg.proj_vis_lang_dim, dtype=dtype)
        if cfg.use_clip_auxiliary_loss:
            # learned temperature, init log(1/0.07) (hulc.py:115)
            self.logit_scale = self.param(
                "logit_scale", lambda k: jnp.asarray(np.log(1 / 0.07), jnp.float32)
            )
        if cfg.use_bc_z_auxiliary_loss:
            self.bc_z_lang_decoder = BCZLangDecoder(cfg.lang_dim, dtype)
        if cfg.use_mia_auxiliary_loss:
            self.mia_lang_discriminator = MIALangDiscriminator(dtype=dtype)

    # ------------------------------------------------------------------
    # Encoders
    # ------------------------------------------------------------------

    def encode(self, batch: ModalityBatch, *, deterministic: bool = True) -> Tuple[Array, Array]:
        return self.perceptual_encoder(
            batch.rgb_obs(), batch.depth_obs(), batch.robot_obs, deterministic=deterministic
        )

    def encode_visual_goal(self, last_emb: Array, *, deterministic: bool = True) -> Array:
        return self.visual_goal(last_emb, deterministic=deterministic)

    def encode_language_goal(self, lang: Array, *, deterministic: bool = True) -> Array:
        return self.language_goal(lang, deterministic=deterministic)

    def _decoder_plan(self, plan: Array) -> Array:
        """GCBC zeroes out the plan input (gcbc.py:104-105)."""
        if self.cfg.model_kind == "gcbc":
            return jnp.zeros(plan.shape[:-1] + (0,), jnp.float32)
        return plan

    # ------------------------------------------------------------------
    # Core CVAE passes
    # ------------------------------------------------------------------

    def lmp_train(
        self,
        rng: Array,
        perceptual_emb: Array,
        latent_goal: Array,
        actions: Array,
        robot_obs: Array,
        *,
        deterministic: bool = True,
    ) -> Dict[str, Any]:
        """Training pass (hulc.py:254-299): posterior plan -> action loss + KL."""
        pp_state = self.plan_proposal(perceptual_emb[:, 0], latent_goal)
        pr_state, seq_feat = self.plan_recognition(perceptual_emb, deterministic=deterministic)
        sampled_plan = self.dist.rsample(rng, pr_state)
        action_loss = self.action_decoder.loss(
            self._decoder_plan(sampled_plan),
            perceptual_emb,
            latent_goal,
            actions,
            robot_obs,
            deterministic=deterministic,
        )
        kl_loss = self.dist.balanced_kl(pr_state, pp_state, self.cfg.loss.kl_balancing_mix)
        return {
            "action_loss": action_loss,
            "kl_loss": kl_loss,  # unscaled; beta applied by caller
            "pp_state": pp_state,
            "pr_state": pr_state,
            "seq_feat": seq_feat,
        }

    def lmp_val(
        self,
        rng: Array,
        perceptual_emb: Array,
        latent_goal: Array,
        actions: Array,
        robot_obs: Array,
        kl_beta: Optional[Array] = None,
    ) -> Dict[str, Any]:
        """Validation pass (hulc.py:301-388): decode with BOTH plan sources."""
        k_pp, k_pr, k_act_pp, k_act_pr = jax.random.split(rng, 4)
        pp_state = self.plan_proposal(perceptual_emb[:, 0], latent_goal)
        sampled_plan_pp = self.dist.sample(k_pp, pp_state)
        action_loss_pp, sample_act_pp = self.action_decoder.loss_and_act(
            k_act_pp, self._decoder_plan(sampled_plan_pp), perceptual_emb, latent_goal, actions, robot_obs
        )
        pr_state, seq_feat = self.plan_recognition(perceptual_emb, deterministic=True)
        sampled_plan_pr = self.dist.sample(k_pr, pr_state)
        action_loss_pr, sample_act_pr = self.action_decoder.loss_and_act(
            k_act_pr, self._decoder_plan(sampled_plan_pr), perceptual_emb, latent_goal, actions, robot_obs
        )
        kl_loss = self.dist.balanced_kl(pr_state, pp_state, self.cfg.loss.kl_balancing_mix)

        def mae(sample_act):
            return jnp.mean(jnp.abs(sample_act[..., :-1] - actions[..., :-1]), axis=1)  # (B, 6)

        def gripper_sr(sample_act):
            pred = jnp.where(sample_act[..., -1] > 0, 1.0, -1.0)
            return jnp.mean((pred == actions[..., -1]).astype(jnp.float32))

        return {
            "sampled_plan_pp": sampled_plan_pp,
            "sampled_plan_pr": sampled_plan_pr,
            "action_loss_pp": action_loss_pp,
            "action_loss_pr": action_loss_pr,
            # scaled by the ANNEALED beta when provided (matches training)
            "kl_loss": kl_loss * (self.cfg.loss.kl_beta if kl_beta is None else kl_beta),
            "mae_pp": mae(sample_act_pp),
            "mae_pr": mae(sample_act_pr),
            "gripper_sr_pp": gripper_sr(sample_act_pp),
            "gripper_sr_pr": gripper_sr(sample_act_pr),
            "seq_feat": seq_feat,
        }

    # ------------------------------------------------------------------
    # Auxiliary losses (lang modality only, masked)
    # ------------------------------------------------------------------

    def clip_loss(self, seq_feat: Array, latent_goal: Array, mask: Optional[Array]) -> Array:
        img_f, txt_f = self.proj_vis_lang(seq_feat, latent_goal)
        return masked_clip_loss(img_f, txt_f, jnp.exp(self.logit_scale), mask)

    def bc_z_loss(self, seq_feat: Array, gt_lang: Array, mask: Optional[Array]) -> Array:
        return masked_bc_z_loss(self.bc_z_lang_decoder(seq_feat), gt_lang, mask)

    def mia_loss(
        self, seq_feat: Array, latent_goal: Array, mask: Optional[Array], *, deterministic: bool = True
    ) -> Array:
        """MIA matching BCE (hulc.py:606-648). Negatives: batch rolled by 1.

        Deviation from the reference: the roll happens over the full batch
        with pair-validity masking (both elements of a pair must be valid)
        instead of rolling the boolean-selected subset — static shapes under
        jit; equivalent in expectation.
        """
        img_f, txt_f = self.proj_vis_lang(seq_feat, latent_goal)
        pred_pos = self.mia_lang_discriminator(img_f, txt_f, deterministic=deterministic)[..., 0]
        rolled = jnp.roll(txt_f, 1, axis=0)
        pred_neg = self.mia_lang_discriminator(img_f, rolled, deterministic=deterministic)[..., 0]
        if mask is None:
            mask = jnp.ones(pred_pos.shape, bool)
        mask = mask.astype(bool)
        neg_mask = mask & jnp.roll(mask, 1, axis=0)

        def bce(logits, labels):
            return jax.nn.softplus(logits) - logits * labels

        losses = jnp.concatenate([bce(pred_pos, 1.0) * mask, bce(pred_neg, 0.0) * neg_mask])
        count = jnp.maximum(jnp.sum(mask) + jnp.sum(neg_mask), 1)
        return jnp.where(jnp.any(mask), jnp.sum(losses) / count, 0.0)

    # ------------------------------------------------------------------
    # Full training objective over the dual-modality batch
    # ------------------------------------------------------------------

    def _fused_train_losses(
        self,
        rng: Array,
        batch: Dict[str, ModalityBatch],
        kl_beta: float,
    ) -> Dict[str, Array]:
        """One 2B-batch pass over [vis; lang] (see train_losses docstring).

        Two input schemas:
          * {"vis": B-batch, "lang": B-batch} — the halves are concatenated
            IN-GRAPH (costs relayout copies on TPU; see config.py).
          * {"fused": 2B-batch} — the LOADER already stacked [vis; lang]
            rows on the host (CombinedLoader fuse=True); no in-graph concat.
            ``lang``/``use_for_aux_lang_loss`` ride on the fused struct and
            cover the second half.
        """
        cfg = self.cfg
        if "fused" in batch:
            fused = batch["fused"]
            b = fused.actions.shape[0] // 2
            lang_emb = fused.lang
            aux_mask = fused.use_for_aux_lang_loss
        else:
            vis, lang = batch["vis"], batch["lang"]
            b = vis.actions.shape[0]
            lang_emb = lang.lang
            aux_mask = lang.use_for_aux_lang_loss

            def cat(f):
                a, c = getattr(vis, f), getattr(lang, f)
                return jnp.concatenate([a, c], axis=0) if a is not None and c is not None else None

            fused = ModalityBatch(
                **{
                    f: None if f in ModalityBatch.LANG_ONLY_FIELDS else cat(f)
                    for f in ModalityBatch._fields
                }
            )
        rng, k_plan = jax.random.split(rng)
        perceptual_emb, visual_emb = self.encode(fused, deterministic=False)
        latent_goal = jnp.concatenate(
            [
                self.encode_visual_goal(perceptual_emb[:b, -1], deterministic=False),
                self.encode_language_goal(lang_emb, deterministic=False),
            ],
            axis=0,
        )

        zeros = jnp.zeros((), jnp.float32)
        totals = {
            "kl_loss": zeros,
            "action_loss": zeros,
            "total_loss": zeros,
            "proprio_loss": zeros,
            "lang_pred_loss": zeros,
            "lang_contrastive_loss": zeros,
            "lang_clip_loss": zeros,
        }
        if cfg.state_recons:
            # fused mean == mean of the two halves' means (equal sizes)
            totals["proprio_loss"] = self.perceptual_encoder.state_reconstruction_loss(
                visual_emb, fused.robot_obs
            )

        if cfg.model_kind == "gcbc":
            empty_plan = jnp.zeros((2 * b, 0), jnp.float32)
            act_ps = self.action_decoder.loss(
                empty_plan,
                perceptual_emb,
                latent_goal,
                fused.actions,
                fused.state_info_robot_obs,
                deterministic=False,
                per_sample=True,
            )
            _, seq_feat = self.plan_recognition(perceptual_emb, deterministic=False)
            kl_ps = jnp.zeros((2 * b,), jnp.float32)
        else:
            pp_state = self.plan_proposal(perceptual_emb[:, 0], latent_goal)
            pr_state, seq_feat = self.plan_recognition(perceptual_emb, deterministic=False)
            sampled_plan = self.dist.rsample(k_plan, pr_state)
            act_ps = self.action_decoder.loss(
                self._decoder_plan(sampled_plan),
                perceptual_emb,
                latent_goal,
                fused.actions,
                fused.state_info_robot_obs,
                deterministic=False,
                per_sample=True,
            )
            kl_ps = kl_beta * self.dist.balanced_kl(
                pr_state, pp_state, cfg.loss.kl_balancing_mix, per_sample=True
            )

        mask = aux_mask
        if cfg.use_bc_z_auxiliary_loss:
            totals["lang_pred_loss"] = self.bc_z_loss(seq_feat[b:], lang_emb, mask)
        if cfg.use_clip_auxiliary_loss:
            totals["lang_clip_loss"] = self.clip_loss(seq_feat[b:], latent_goal[b:], mask)
        if cfg.use_mia_auxiliary_loss:
            totals["lang_contrastive_loss"] = self.mia_loss(
                seq_feat[b:], latent_goal[b:], mask, deterministic=False
            )

        per_mod: Dict[str, Array] = {}
        for scope, sl in (("vis", slice(0, b)), ("lang", slice(b, None))):
            act = jnp.mean(act_ps[sl])
            kl = jnp.mean(kl_ps[sl])
            per_mod[f"action_loss_{scope}"] = act
            per_mod[f"kl_loss_scaled_{scope}"] = kl
            per_mod[f"total_loss_{scope}"] = act + kl
        # normalize by number of datasets (hulc.py:491); == fused means
        totals["action_loss"] = jnp.mean(act_ps)
        totals["kl_loss"] = jnp.mean(kl_ps)
        totals["total_loss"] = totals["action_loss"] + totals["kl_loss"]
        if cfg.state_recons:
            totals["total_loss"] += cfg.loss.state_recon_beta * totals["proprio_loss"]
        if cfg.use_bc_z_auxiliary_loss:
            totals["total_loss"] += cfg.loss.bc_z_auxiliary_loss_beta * totals["lang_pred_loss"]
        if cfg.use_mia_auxiliary_loss:
            totals["total_loss"] += cfg.loss.mia_auxiliary_loss_beta * totals["lang_contrastive_loss"]
        if cfg.use_clip_auxiliary_loss:
            totals["total_loss"] += cfg.loss.clip_auxiliary_loss_beta * totals["lang_clip_loss"]
        totals.update(per_mod)
        return totals

    def train_losses(
        self,
        rng: Array,
        batch: Dict[str, ModalityBatch],
        kl_beta: float,
    ) -> Dict[str, Array]:
        """One optimizer step's losses (reference training_step, hulc.py:390).

        batch: {"vis": ModalityBatch, "lang": ModalityBatch} (either may be
        absent — the dict structure is static under jit).

        With ``cfg.fuse_modalities=True`` (and both modalities present at
        equal batch shapes) the two passes are FUSED into one 2B-batch pass
        through encoders/plan nets/decoder. The estimator is identical:
        equal halves make mean-of-means equal the fused mean, and
        per-modality logging is recovered from per-sample losses. Off by
        default: on v5e the in-graph image concat costs more in relayout
        copies than the fused pass saves (see config.py).
        """
        cfg = self.cfg
        if "fused" in batch:  # loader-side fused schema: always the fused pass
            return self._fused_train_losses(rng, batch, kl_beta)
        def _same_shape(a, b):
            return (a is None and b is None) or (
                a is not None and b is not None and a.shape == b.shape
            )

        if (
            cfg.fuse_modalities
            and set(batch) == {"vis", "lang"}
            and batch["vis"].actions.shape == batch["lang"].actions.shape
            and _same_shape(batch["vis"].rgb_static, batch["lang"].rgb_static)
        ):
            return self._fused_train_losses(rng, batch, kl_beta)
        zeros = jnp.zeros((), jnp.float32)
        totals = {
            "kl_loss": zeros,
            "action_loss": zeros,
            "total_loss": zeros,
            "proprio_loss": zeros,
            "lang_pred_loss": zeros,
            "lang_contrastive_loss": zeros,
            "lang_clip_loss": zeros,
        }
        per_mod: Dict[str, Array] = {}

        for scope, mod_batch in batch.items():
            rng, k_plan = jax.random.split(rng)
            perceptual_emb, visual_emb = self.encode(mod_batch, deterministic=False)
            if cfg.state_recons:
                totals["proprio_loss"] += self.perceptual_encoder.state_reconstruction_loss(
                    visual_emb, mod_batch.robot_obs
                )
            if "lang" in scope:
                latent_goal = self.encode_language_goal(mod_batch.lang, deterministic=False)
            else:
                latent_goal = self.encode_visual_goal(perceptual_emb[:, -1], deterministic=False)

            if cfg.model_kind == "gcbc":
                # GCBC (gcbc.py): no plan, no KL; recognition still runs to
                # produce seq_feat for the language aux losses.
                empty_plan = jnp.zeros((mod_batch.actions.shape[0], 0), jnp.float32)
                act_loss = self.action_decoder.loss(
                    empty_plan,
                    perceptual_emb,
                    latent_goal,
                    mod_batch.actions,
                    mod_batch.state_info_robot_obs,
                    deterministic=False,
                )
                _, seq_feat = self.plan_recognition(perceptual_emb, deterministic=False)
                kl = zeros
                mod_loss = act_loss
            else:
                out = self.lmp_train(
                    k_plan,
                    perceptual_emb,
                    latent_goal,
                    mod_batch.actions,
                    mod_batch.state_info_robot_obs,
                    deterministic=False,
                )
                act_loss = out["action_loss"]
                kl = out["kl_loss"] * kl_beta
                seq_feat = out["seq_feat"]
                mod_loss = act_loss + kl

            if "lang" in scope:
                mask = mod_batch.use_for_aux_lang_loss
                if cfg.use_bc_z_auxiliary_loss:
                    totals["lang_pred_loss"] += self.bc_z_loss(seq_feat, mod_batch.lang, mask)
                if cfg.use_clip_auxiliary_loss:
                    totals["lang_clip_loss"] += self.clip_loss(seq_feat, latent_goal, mask)
                if cfg.use_mia_auxiliary_loss:
                    totals["lang_contrastive_loss"] += self.mia_loss(
                        seq_feat, latent_goal, mask, deterministic=False
                    )

            totals["kl_loss"] += kl
            totals["action_loss"] += act_loss
            totals["total_loss"] += mod_loss
            per_mod[f"action_loss_{scope}"] = act_loss
            per_mod[f"kl_loss_scaled_{scope}"] = kl
            per_mod[f"total_loss_{scope}"] = mod_loss

        n = float(len(batch))  # normalize by number of datasets (hulc.py:491)
        for key in ("kl_loss", "action_loss", "total_loss"):
            totals[key] = totals[key] / n
        if cfg.state_recons:
            totals["proprio_loss"] = totals["proprio_loss"] / n
            totals["total_loss"] += cfg.loss.state_recon_beta * totals["proprio_loss"]
        if cfg.use_bc_z_auxiliary_loss:
            totals["total_loss"] += cfg.loss.bc_z_auxiliary_loss_beta * totals["lang_pred_loss"]
        if cfg.use_mia_auxiliary_loss:
            totals["total_loss"] += cfg.loss.mia_auxiliary_loss_beta * totals["lang_contrastive_loss"]
        if cfg.use_clip_auxiliary_loss:
            totals["total_loss"] += cfg.loss.clip_auxiliary_loss_beta * totals["lang_clip_loss"]
        totals.update(per_mod)
        return totals

    def gcbc_val(
        self,
        rng: Array,
        perceptual_emb: Array,
        latent_goal: Array,
        actions: Array,
        robot_obs: Array,
    ) -> Dict[str, Any]:
        """GCBC validation (gcbc.py:183-283): empty plan, no proposal/KL.

        Metrics are reported under the *_pp/_pr names with identical values
        so the metric schema stays uniform across model kinds.
        """
        empty_plan = jnp.zeros((actions.shape[0], 0), jnp.float32)
        action_loss, sample_act = self.action_decoder.loss_and_act(
            rng, empty_plan, perceptual_emb, latent_goal, actions, robot_obs
        )
        _, seq_feat = self.plan_recognition(perceptual_emb, deterministic=True)
        mae = jnp.mean(jnp.abs(sample_act[..., :-1] - actions[..., :-1]), axis=1)
        pred_gripper = jnp.where(sample_act[..., -1] > 0, 1.0, -1.0)
        gripper_sr = jnp.mean((pred_gripper == actions[..., -1]).astype(jnp.float32))
        zero_plan = jnp.zeros((actions.shape[0], 1), jnp.float32)
        return {
            "sampled_plan_pp": zero_plan,
            "sampled_plan_pr": zero_plan,
            "action_loss_pp": action_loss,
            "action_loss_pr": action_loss,
            "kl_loss": jnp.zeros((), jnp.float32),
            "mae_pp": mae,
            "mae_pr": mae,
            "gripper_sr_pp": gripper_sr,
            "gripper_sr_pr": gripper_sr,
            "seq_feat": seq_feat,
        }

    def val_metrics(
        self, rng: Array, batch: Dict[str, ModalityBatch], kl_beta: Optional[Array] = None
    ) -> Dict[str, Any]:
        """Validation metrics for one combined batch (hulc.py:739-841)."""
        cfg = self.cfg
        out: Dict[str, Any] = {}
        val_total_act_loss_pp = jnp.zeros((), jnp.float32)
        for scope, mod_batch in batch.items():
            rng, k = jax.random.split(rng)
            perceptual_emb, _ = self.encode(mod_batch, deterministic=True)
            if "lang" in scope:
                latent_goal = self.encode_language_goal(mod_batch.lang)
            else:
                latent_goal = self.encode_visual_goal(perceptual_emb[:, -1])
            if cfg.model_kind == "gcbc":
                metrics = self.gcbc_val(
                    k, perceptual_emb, latent_goal, mod_batch.actions, mod_batch.state_info_robot_obs
                )
            else:
                metrics = self.lmp_val(
                    k, perceptual_emb, latent_goal, mod_batch.actions,
                    mod_batch.state_info_robot_obs, kl_beta,
                )
            if "lang" in scope and cfg.use_clip_auxiliary_loss:
                out["val_pred_clip_loss"] = self.clip_loss(
                    metrics["seq_feat"], latent_goal, mod_batch.use_for_aux_lang_loss
                )
            val_total_act_loss_pp += metrics["action_loss_pp"]
            for name in (
                "action_loss_pp",
                "action_loss_pr",
                "kl_loss",
                "gripper_sr_pp",
                "gripper_sr_pr",
            ):
                out[f"{scope}_{name}"] = metrics[name]
            out[f"{scope}_mae_pp"] = jnp.mean(metrics["mae_pp"])
            out[f"{scope}_mae_pr"] = jnp.mean(metrics["mae_pr"])
            out[f"{scope}_pos_mae_pp"] = jnp.mean(metrics["mae_pp"][..., :3])
            out[f"{scope}_pos_mae_pr"] = jnp.mean(metrics["mae_pr"][..., :3])
            out[f"{scope}_orn_mae_pp"] = jnp.mean(metrics["mae_pp"][..., 3:6])
            out[f"{scope}_orn_mae_pr"] = jnp.mean(metrics["mae_pr"][..., 3:6])
            out[f"sampled_plan_pp_{scope}"] = metrics["sampled_plan_pp"]
            out[f"sampled_plan_pr_{scope}"] = metrics["sampled_plan_pr"]
        out["action_loss_pp"] = val_total_act_loss_pp / float(len(batch))
        return out

    # ------------------------------------------------------------------
    # Inference pieces (jitted by the rollout wrapper)
    # ------------------------------------------------------------------

    def propose_plan(self, rng: Array, perceptual_emb: Array, latent_goal: Array) -> Array:
        """Sample a plan from the proposal prior (hulc.py:910-957).

        GCBC never consults the proposal net (gcbc.py step()); it returns an
        empty plan directly.
        """
        if self.cfg.model_kind == "gcbc":
            return jnp.zeros((perceptual_emb.shape[0], 0), jnp.float32)
        pp_state = self.plan_proposal(perceptual_emb[:, 0], latent_goal)
        plan = self.dist.sample(rng, pp_state)
        return self._decoder_plan(plan)

    def decoder_act(
        self, rng: Array, plan: Array, perceptual_emb: Array, latent_goal: Array, robot_obs: Array, carry
    ) -> Tuple[Array, object]:
        return self.action_decoder.act(rng, plan, perceptual_emb, latent_goal, robot_obs, carry)

    def init_decoder_carry(self, batch_size: int):
        return self.action_decoder.init_carry(batch_size)
