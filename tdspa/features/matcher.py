"""Learned matching head over frame-0 cost volumes (CoTracker-class step).

The classical tracker (ops/lk.py, kernels/lk.py) localizes with
brightness-constancy LK and verifies with center-weighted NCC against the
frame-0 template — both degrade together under sensor noise, low contrast,
and exposure flicker, because they share one hand-crafted appearance model
(raw grayscale windows). This module replaces that appearance model with a
LEARNED one, trained on synthetic scenes with exact ground truth
(tdspa.utils.synthetic_video) under exactly those degradations:

* ``MatcherFeatureNet``: a 2-conv encoder (grayscale -> D-dim L2-normalized
  feature maps). Convs are MXU-friendly; one forward per frame, amortized
  over all points.
* ``MatcherHead``: an MLP over the (2R+1)^2 correlation patch between the
  frame-0 template feature and the current frame's feature neighborhood,
  regressing a sub-pixel offset correction and a visibility logit.
* ``refine_tracks``: iterative runtime pass — sample the cost patch at the
  current estimate, apply the head, move, repeat; fuses the head's
  visibility with the cost evidence.
* ``TemplateSelect`` + the template BANK (round 4): the frame-0 template
  goes stale under deformation/rotation (the round-3 measured limiter on
  non-rigid content). With ``bank > 0`` the refinement runs two phases:
  phase 1 against the frame-0 template as before, then a bank of
  visibility-gated template vectors is sampled from the phase-1 positions
  (per point: the most-visible frame in each of ``bank`` temporal
  segments, falling back to frame 0 when a segment has no confident
  frame), and phase 2 re-refines against a LEARNED softmax selection over
  the per-template cost patches. Everything stays one batched program —
  no per-frame recurrence; the expensive patch sampling is shared across
  templates on the XLA path.
* Motion-field RESCUE (round 4): after refinement, points whose
  initialization was beyond the head's search reach stay lost — and the
  displacement fields that cause that (deformation, rotation, fast pan)
  are spatially smooth. ``_field_candidate`` interpolates each lost
  point's position from its confident neighbors' displacements (IDW over
  frame-0 positions, two matmuls), the candidate is re-refined, and the
  matcher's own visibility logit adjudicates the switch
  (``refine_tracks(..., rescue=1)``, the default).
* ``train_matcher``: self-supervised-style training driver (the scenes are
  synthetic, so supervision is free): given a ground-truth position
  perturbed by up to ``radius`` px, predict the correction and the
  ground-truth visibility — differentiated through the SAME two-phase
  bank code path the runtime executes.

This is the reference's CoTracker3 capability slot (inference.py:97-154)
built the TPU-native way: correlation + learned readout, batched over all
points and frames in one jitted program — not a port of CoTracker's
recurrent torch graph. The classical tracker remains the default front-end;
the matcher is an opt-in refinement (``PyramidalLKTracker(matcher=...)``)
and is benchmarked against the same ground-truth scenes
(tests/unit/test_matcher.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from tdspa.ops.geometry import bilinear_sample


class MatcherFeatureNet(nn.Module):
    """Grayscale [T H W] -> L2-normalized features [T H/s W/s dim].

    ``stride`` strides the first conv (CoTracker-style strided feature
    maps). stride=2 makes a 512x512 frame's feature map small enough to
    stage in TPU VMEM (256*256*16*4B = 4.2 MB), which is what lets the
    Pallas cost-patch kernel replace XLA's pathological per-point gathers
    at pipeline scale. Image px -> feature px: f = (p - (stride-1)) / stride
    (XLA SAME-pad stride-2 7x7 centers output i at input 2i+1).
    """

    dim: int = 16
    hidden: int = 16
    stride: int = 2

    @nn.compact
    def __call__(self, gray):  # [T H W] f32 (0..1 scale)
        x = gray[..., jnp.newaxis] * 2.0 - 1.0
        x = nn.Conv(
            self.hidden, (7, 7), strides=(self.stride, self.stride),
            padding="SAME", name="conv0",
        )(x)
        x = nn.gelu(x)
        x = nn.Conv(self.dim, (3, 3), padding="SAME", name="conv1")(x)
        return x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-6)


def img_to_feat(coords, stride: int):
    """Image-pixel (x, y) -> feature-map coordinates (see MatcherFeatureNet)."""
    return (coords - float(stride - 1)) / float(stride)


class MatcherHead(nn.Module):
    """Cost patch [(2R+1)^2] (+ peak stats) -> (offset [2], vis logit)."""

    radius: int = 4
    hidden: int = 128

    @nn.compact
    def __call__(self, cost):  # [... K2]
        k = 2 * self.radius + 1
        # Soft-argmax of the raw cost patch: a geometry-aware feature the
        # MLP only needs to correct, not rediscover.
        offs = _offset_grid(self.radius)  # [K2, 2]
        w = jax.nn.softmax(cost * 10.0, axis=-1)
        soft_xy = w @ offs  # [... 2]
        peak = jnp.max(cost, axis=-1, keepdims=True)
        mean = jnp.mean(cost, axis=-1, keepdims=True)
        x = jnp.concatenate([cost, soft_xy, peak, mean], axis=-1)
        x = nn.gelu(nn.Dense(self.hidden, name="fc0")(x))
        x = nn.gelu(nn.Dense(self.hidden, name="fc1")(x))
        out = nn.Dense(3, name="fc_out")(x)
        # Offsets bounded to the search window (tanh * radius) + soft-argmax
        # prior; visibility is a free logit.
        offset = soft_xy + jnp.tanh(out[..., :2]) * self.radius
        return offset, out[..., 2]


class TemplateSelect(nn.Module):
    """Per-template quality stats -> softmax selection weights.

    Input [... M 4]: (peak, mean, peak - mean, temporal distance) of each
    template's cost patch. A sharp, high peak over a flat background marks
    a template that still matches the current appearance; stale templates
    (deformed / rotated content) flatten. The temporal distance
    |frame - anchor_frame| / T lets selection prefer temporally-near
    templates on deforming content, where appearance decorrelates with
    time. One Dense keeps it a calibrated scorer, not a second matcher.
    """

    @nn.compact
    def __call__(self, stats):  # [... M 4]
        score = nn.Dense(1, name="fc")(stats)[..., 0]  # [... M]
        return jax.nn.softmax(score, axis=-1)


def _bank_stats(cost, dt):  # [... M K2], [... M] -> [... M 4]
    peak = jnp.max(cost, axis=-1)
    mean = jnp.mean(cost, axis=-1)
    return jnp.stack([peak, mean, peak - mean, dt], axis=-1)


@functools.lru_cache(maxsize=8)
def _offset_grid_np(radius: int):
    r = np.arange(-radius, radius + 1, dtype=np.float32)
    oy, ox = np.meshgrid(r, r, indexing="ij")
    return np.stack([ox.ravel(), oy.ravel()], axis=-1)  # [K2, 2] (x, y)


def _offset_grid(radius: int):
    return jnp.asarray(_offset_grid_np(radius))


def _to_gray01(video):
    v = jnp.asarray(video, jnp.float32)
    if v.shape[-1] == 3:  # [... H W 3]
        v = v @ jnp.asarray([0.299, 0.587, 0.114], jnp.float32)
    return v / 255.0


def init_matcher(key, dim: int = 16, radius: int = 4, hidden: int = 128,
                 stride: int = 2, fhidden: int = 32, bank: int = 0):
    """Initialize matcher params {'feature', 'head'[, 'select'], 'config'}.

    ``radius`` is in FEATURE pixels (search reach = radius*stride image px).
    ``bank`` > 0 enables the two-phase template-memory refinement with that
    many visibility-gated historical templates (plus the frame-0 one).
    """
    kf, kh, ks = jax.random.split(key, 3)
    fnet = MatcherFeatureNet(dim=dim, stride=stride, hidden=fhidden)
    head = MatcherHead(radius=radius, hidden=hidden)
    k2 = (2 * radius + 1) ** 2
    fparams = fnet.init(kf, jnp.zeros((1, 32, 128)))["params"]
    hparams = head.init(kh, jnp.zeros((1, k2)))["params"]
    params = {
        "feature": fparams,
        "head": hparams,
        "config": {"dim": dim, "radius": radius, "hidden": hidden,
                   "stride": stride, "fhidden": fhidden, "bank": bank},
    }
    if bank > 0:
        params["select"] = TemplateSelect().init(
            ks, jnp.zeros((1, bank + 1, 4))
        )["params"]
    return params


def _cfg(params):
    c = params["config"]

    def geti(name, default=None):
        return int(np.asarray(c[name])) if name in c else default

    return (
        geti("dim"),
        geti("radius"),
        geti("hidden"),
        geti("stride", 1),
        geti("fhidden", 16),
        geti("bank", 0),
    )


def compute_features(params, video):
    """[T H W (3)] -> [T H/s W/s D] L2-normalized match features."""
    dim, _, _, stride, fhidden, _ = _cfg(params)
    return MatcherFeatureNet(dim=dim, stride=stride, hidden=fhidden).apply(
        {"params": params["feature"]}, _to_gray01(video)
    )


def _cost_patches(feats, template_vec, positions, radius: int, stride: int):
    """Correlation patches around per-frame positions (XLA path).

    feats: [T Hf Wf D]; template_vec: [N D]; positions: [N T 2] IMAGE px.
    Returns cost [N T K2] over the (2R+1)^2 FEATURE-px offset grid.

    TPU note: this lowers to per-point gathers, which TPUs execute ~1000x
    slower than the arithmetic warrants; the runtime path dispatches to
    tdspa.kernels.matcher.cost_patches_pallas on TPU instead (same output,
    interior-exact — see its parity test).
    """
    return _cost_patches_multi(
        feats, template_vec[:, jnp.newaxis], positions, radius, stride
    )[:, :, 0]


def _cost_patches_multi(feats, template_vecs, positions, radius: int,
                        stride: int):
    """Cost patches against a template BANK (XLA path).

    template_vecs: [N M D]. Returns [N T M K2]. The expensive patch
    sampling happens ONCE — the bank only widens the final einsum.
    """
    n, t = positions.shape[:2]
    offs = _offset_grid(radius)  # [K2, 2]
    k2 = offs.shape[0]
    fpos = img_to_feat(positions, stride)
    coords = fpos[:, jnp.newaxis, :, :] + offs[:, jnp.newaxis, :]
    # [N K2 T 2] -> flatten the patch axis into N for bilinear_sample.
    patch = bilinear_sample(
        feats, coords.reshape(n * k2, t, 2)
    ).reshape(n, k2, t, -1)
    return jnp.einsum("nktd,nmd->ntmk", patch, template_vecs)


def _build_bank(sampled, vis_logit, template_vec0, bank: int):
    """Visibility-gated historical template bank.

    sampled: [N T D] feature vectors at the current position estimates;
    vis_logit: [N T] current visibility; template_vec0: [N D].
    Per point and per temporal segment (``bank`` equal segments), takes the
    most-visible frame's vector; a segment whose best logit is <= 0 (no
    confidently-visible frame — the point is occluded there) falls back to
    the frame-0 template, so occlusion never poisons the bank.
    Returns (vecs [N bank+1 D], anchor frame indices [N bank+1] f32), with
    the frame-0 template first.
    """
    n, t, _ = sampled.shape
    bounds = np.linspace(0, t, bank + 1).astype(int)
    zeros = jnp.zeros((n,), jnp.float32)
    vecs, anchors = [template_vec0], [zeros]
    for m in range(bank):
        lo, hi = int(bounds[m]), int(bounds[m + 1])
        if hi <= lo:  # more segments than frames: duplicate frame 0
            vecs.append(template_vec0)
            anchors.append(zeros)
            continue
        seg = vis_logit[:, lo:hi]
        idx = jnp.argmax(seg, axis=1)  # [N]
        vec = jnp.take_along_axis(
            sampled[:, lo:hi], idx[:, None, None], axis=1
        )[:, 0]
        conf = jnp.take_along_axis(seg, idx[:, None], axis=1)[:, 0]
        ok = conf > 0.0
        vecs.append(jnp.where(ok[:, None], vec, template_vec0))
        anchors.append(jnp.where(ok, (idx + lo).astype(jnp.float32), 0.0))
    return jnp.stack(vecs, axis=1), jnp.stack(anchors, axis=1)


# Motion-field rescue operating point (swept on held-out scenes,
# docs/BENCHMARKS.md "Motion-field rescue"): rescue a point only where its
# refined visibility logit is below RESCUE_GATE AND the re-refined
# geometric candidate's logit beats it by RESCUE_MARGIN; a rescued point's
# visibility claim is weaker evidence (it was re-seated at a guessed
# location), so its logit is demoted by RESCUE_PENALTY — position keeps
# the better estimate either way, occlusion recall stays intact.
RESCUE_GATE = 0.0
RESCUE_MARGIN = 1.0
RESCUE_PENALTY = 2.5
# IDW confidence threshold / distance softening (feature of the scene
# scale: 25 px^2 ~ a 5 px near-field plateau so the nearest neighbor
# doesn't dominate the vote).
RESCUE_CONF = 1.0
RESCUE_SOFTEN = 25.0


def _field_candidate(x0, pos, vis_logit):
    """IDW-interpolated geometric candidate positions. [N T 2].

    The displacement fields that defeat a local matcher (deformation,
    rotation, fast pan: the LK initialization lands > search-reach away)
    are spatially SMOOTH — so a lost point's true location is well
    predicted by its confident neighbors' displacements. Inverse-distance
    weights over the frame-0 positions, masked per frame by confidence
    (vis_logit > RESCUE_CONF), interpolate every point's displacement;
    the caller re-refines this single motion-consistent candidate and
    adjudicates with the matcher's own visibility logit. Occluded points
    stay occluded: the interpolated location genuinely doesn't match, so
    the candidate's logit never clears the margin.

    MXU formulation: the per-frame confidence masking folds into two
    matmuls ([N N] @ [N T*2] and [N N] @ [N T]) instead of a vmapped
    per-frame mask — one fused pair of contractions on TPU.

    x0: [N 2] frame-0 positions; pos: [N T 2]; vis_logit: [N T].
    """
    n, t = pos.shape[:2]
    disp = pos - x0[:, jnp.newaxis, :]                       # [N T 2]
    conf = (vis_logit > RESCUE_CONF).astype(jnp.float32)     # [N T]
    d2 = jnp.sum((x0[:, jnp.newaxis] - x0[jnp.newaxis]) ** 2, -1)
    w = 1.0 / (d2 + RESCUE_SOFTEN)
    # Zero self-weight: a lost point must not vote for itself.
    w = w * (1.0 - jnp.eye(n, dtype=w.dtype))                # [N N]
    num = (w @ (conf[..., jnp.newaxis] * disp).reshape(n, t * 2))
    den = w @ conf + 1e-6                                    # [N T]
    dhat = num.reshape(n, t, 2) / den[..., jnp.newaxis]
    return x0[:, jnp.newaxis, :] + dhat


def _run_matcher(weights, head, cost_multi, feats, template_vec, tracks,
                 stride: int, iterations: int, bank: int):
    """The (two-)phase refinement shared by runtime and training.

    Phase 1 refines against the frame-0 template. With ``bank`` > 0 (and
    ``weights['select']`` present), a visibility-gated bank is sampled
    from the phase-1 positions and phase 2 re-refines against the learned
    softmax selection over per-template cost patches.

    Returns (positions [N T 2], vis logits [N T], per-iteration list of
    (pos, vis) for training supervision).
    """
    steps = []
    pos = tracks
    vis = jnp.zeros(tracks.shape[:2], jnp.float32)
    for _ in range(iterations):
        cost = cost_multi(pos, template_vec[:, jnp.newaxis])[:, :, 0]
        delta, vis = head.apply({"params": weights["head"]}, cost)
        pos = pos + delta * float(stride)
        steps.append((pos, vis))
    if bank > 0:
        select = TemplateSelect()
        t = tracks.shape[1]
        frames = jnp.arange(t, dtype=jnp.float32)
        for _ in range(iterations):
            # Rebuild the bank each iteration from the CURRENT estimates —
            # later iterations get fresher, better-localized templates.
            sampled = bilinear_sample(feats, img_to_feat(pos, stride))
            bankvecs, anchors = _build_bank(sampled, vis, template_vec, bank)
            cost = cost_multi(pos, bankvecs)  # [N T M K2]
            dt = jnp.abs(
                frames[jnp.newaxis, :, jnp.newaxis]
                - anchors[:, jnp.newaxis, :]
            ) / float(max(t, 1))  # [N T M]
            w = select.apply(
                {"params": weights["select"]}, _bank_stats(cost, dt)
            )  # [N T M]
            fused = jnp.einsum("ntm,ntmk->ntk", w, cost)
            delta, vis = head.apply({"params": weights["head"]}, fused)
            pos = pos + delta * float(stride)
            steps.append((pos, vis))
    return pos, vis, steps


def refine_tracks(params, video, tracks, iterations: int = 2,
                  template_frame=None, template_pos=None,
                  refine_first: bool = False, backend: str = "auto",
                  rescue: int = 1):
    """Refine per-frame positions with the learned matcher.

    Args:
      params: init_matcher/train_matcher output (or loaded npz tree).
      video: [T H W (3)] uint8/f32.
      tracks: [N T 2] f32 — initial estimates (e.g. the LK tracker's).
      iterations: cost-sample/correct rounds per frame.
      template_frame: [H W (3)] override for the template image (chunked
        tracking passes the ORIGINAL first frame; default = video[0]).
      template_pos: [N 2] override for the template positions (default =
        tracks[:, 0]).
      refine_first: also refine frame 0 (chunk continuations want this;
        default leaves frame 0 = the template definition untouched, with a
        strongly-visible logit).
      backend: 'auto' (Pallas cost kernel on TPU, XLA elsewhere) | 'xla' |
        'pallas' | 'pallas_interpret'. The XLA cost sampling is
        gather-bound and TPU-hostile; the kernel is interior-exact (border
        windows shift inward, see tdspa/kernels/matcher.py).
      rescue: motion-field rescue rounds (default 1; 0 disables). Each
        round interpolates lost points' positions from confident
        neighbors' displacements (_field_candidate), re-refines that
        geometric candidate, and switches only where the matcher's own
        visibility logit clearly prefers it. Recovers points whose
        initialization was beyond the search reach (deformation /
        rotation / fast pan); measured no-op on clean content. One round
        is the swept optimum.

    Returns:
      (tracks [N T 2], vis_logits [N T]).
    """
    # static config: resolve outside jit
    dim, radius, hidden, stride, fhidden, bank = _cfg(params)
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    weights = {"feature": params["feature"], "head": params["head"]}
    if bank > 0:
        weights["select"] = params["select"]
    if template_frame is None:
        template_frame = jnp.asarray(video)[0]
    if template_pos is None:
        template_pos = jnp.asarray(tracks, jnp.float32)[:, 0]
    return _refine_tracks_jit(
        weights, jnp.asarray(video), jnp.asarray(tracks, jnp.float32),
        jnp.asarray(template_frame), jnp.asarray(template_pos, jnp.float32),
        dim, radius, hidden, stride, fhidden, bank, iterations, refine_first,
        backend, rescue,
    )


def _make_cost_multi(feats, radius: int, stride: int, backend: str):
    """(pos [N T 2] image px, tvecs [N M D]) -> costs [N T M K2]."""
    if backend == "xla":
        def cost_multi(pos, tvecs):
            return _cost_patches_multi(feats, tvecs, pos, radius, stride)
        return cost_multi

    from tdspa.kernels.matcher import cost_patches_multi_pallas

    def cost_multi(pos, tvecs):
        # One kernel pass for the whole bank: the per-point strip
        # loads/rolls are shared across templates in VMEM, so M templates
        # cost ~M tiny extra contraction passes, not M kernel invocations.
        return cost_patches_multi_pallas(
            feats, tvecs, img_to_feat(pos, stride), radius,
            interpret=(backend == "pallas_interpret"),
        )

    return cost_multi


@functools.partial(
    jax.jit,
    static_argnames=(
        "dim", "radius", "hidden", "stride", "fhidden", "bank", "iterations",
        "refine_first", "backend", "rescue",
    ),
)
def _refine_tracks_jit(params, video, tracks, template_frame, template_pos,
                       dim, radius, hidden, stride, fhidden, bank, iterations,
                       refine_first, backend="xla", rescue=0):
    head = MatcherHead(radius=radius, hidden=hidden)
    fnet = MatcherFeatureNet(dim=dim, stride=stride, hidden=fhidden)
    feats = fnet.apply({"params": params["feature"]}, _to_gray01(video))
    tfeats = fnet.apply(
        {"params": params["feature"]}, _to_gray01(template_frame)[jnp.newaxis]
    )
    template_vec = bilinear_sample(
        tfeats, img_to_feat(template_pos, stride)[:, jnp.newaxis]
    )[:, 0]  # [N D]

    cost_multi = _make_cost_multi(feats, radius, stride, backend)
    pos, vis, _ = _run_matcher(
        params, head, cost_multi, feats, template_vec, tracks,
        stride, iterations, bank,
    )
    for _ in range(rescue):
        cand = _field_candidate(tracks[:, 0], pos, vis)
        pos2, vis2, _ = _run_matcher(
            params, head, cost_multi, feats, template_vec, cand,
            stride, iterations, bank,
        )
        lost = vis < RESCUE_GATE
        # Position adopts the candidate on ANY logit improvement: the
        # original estimate there is a lost point's bad lock, so the
        # better-verified location strictly helps localization metrics
        # while the visibility decision stays untouched below the margin.
        switch_pos = lost & (vis2 > vis)
        switch_vis = lost & (vis2 > vis + RESCUE_MARGIN)
        pos = jnp.where(switch_pos[..., jnp.newaxis], pos2, pos)
        vis = jnp.where(switch_vis, vis2 - RESCUE_PENALTY, vis)
    if not refine_first:
        # Frame 0 is the template: identity position, surely visible.
        pos = jnp.concatenate([tracks[:, :1], pos[:, 1:]], axis=1)
        vis = jnp.concatenate(
            [jnp.full_like(vis[:, :1], 10.0), vis[:, 1:]], 1
        )
    return pos, vis


# --------------------------------------------------------------------- #
# Training
# --------------------------------------------------------------------- #


def make_training_scenes(
    num_scenes: int,
    seed: int = 0,
    num_frames: int = 16,
    height: int = 128,
    width: int = 192,
    grid_size: int = 10,
    deform_amp_max: float = 0.0,
    rot_rate_max: float = 0.0,
    natural_frac: float = 0.0,
):
    """Degradation-randomized synthetic scenes with exact ground truth.

    ``deform_amp_max`` > 0 adds non-rigid warps (amp ~ U(0, max)) to every
    other scene. Measured NEUTRAL for the shipped bank=0 matcher:
    retraining with deform_amp_max=5 moved deforming-scene metrics by
    <= +0.02 (pts2/acc) while costing 0.04-0.05 occlusion recall on rigid
    scenes — the rigid-trained matcher already generalizes to smooth
    warps, and THAT model's limiter was frame-0 template staleness, which
    the template bank now addresses (docs/BENCHMARKS.md "Non-rigid
    content", "Template-memory bank").

    ``rot_rate_max`` > 0 adds camera roll (rad/frame ~ U(0, max)) to every
    third scene — the benchmark's rotation regimes are otherwise absent
    from training. All knobs draw from the rng ONLY when enabled so
    disabled runs regenerate the shipped weights' scene distribution.

    ``natural_frac`` > 0 renders that fraction of scenes with the
    multi-octave ~1/f "natural" texture (+ a random camera-response gamma
    in [1.6, 2.4]) — the photographic-statistics regime where the
    cells-trained matcher measured WORSE than classical LK on noisy
    low-contrast content (pts-within-2 0.162 vs 0.252 — round-5 gate
    stress test, docs/BENCHMARKS.md "Natural-statistics scenes").
    """
    from tdspa.utils.synthetic_video import make_tracking_scene

    rng = np.random.default_rng(seed)
    scenes = []
    for i in range(num_scenes):
        pan = (int(rng.integers(-4, 5)), int(rng.integers(-3, 4)))
        video, tracks, visible = make_tracking_scene(
            num_frames=num_frames,
            height=height,
            width=width,
            grid_size=grid_size,
            num_sprites=int(rng.integers(1, 4)),
            seed=seed * 1000 + i,
            pan=pan,
            noise_sigma=float(rng.uniform(0.0, 25.0)),
            contrast=float(rng.uniform(0.35, 1.0)),
            gain_flicker=float(rng.uniform(0.0, 0.25)),
            # Draw ONLY when enabled: even uniform(0, 0) advances the rng,
            # which would shift every later scene's params away from the
            # distribution the shipped weights were trained on.
            deform_amp=(
                float(rng.uniform(0.0, deform_amp_max))
                if (deform_amp_max > 0.0 and i % 2)
                else 0.0
            ),
            rot_rate=(
                float(rng.uniform(0.0, rot_rate_max))
                if (rot_rate_max > 0.0 and i % 3 == 2)
                else 0.0
            ),
            **(
                {
                    "texture": "natural",
                    "camera_gamma": float(rng.uniform(1.6, 2.4)),
                }
                if (natural_frac > 0.0 and rng.uniform() < natural_frac)
                else {}
            ),
        )
        scenes.append((video, tracks, visible))
    videos = np.stack([s[0] for s in scenes])
    tracks = np.stack([s[1] for s in scenes])
    visible = np.stack([s[2] for s in scenes])
    return videos, tracks, visible


def train_matcher(
    key,
    steps: int = 1500,
    num_scenes: int = 24,
    learning_rate: float = 2e-3,
    dim: int = 16,
    radius: int = 4,
    hidden: int = 128,
    stride: int = 2,
    fhidden: int = 32,
    iterations: int = 2,
    bank: int = 0,
    occlusion_weight: float = 4.0,
    scene_kwargs: dict | None = None,
    log_every: int = 50,
):
    """Train the matcher on synthetic degraded scenes. Returns (params, log).

    Supervision is exact (synthetic ground truth): for random (point, frame)
    pairs, perturb the true position by up to the search reach
    (radius*stride image px) and train — differentiated through the SAME
    (two-)phase ``_run_matcher`` code path the runtime executes, so with
    ``bank`` > 0 the template bank is built from the model's own phase-1
    positions/visibility exactly as at inference — to (a) regress the
    correction, (b) classify ground-truth visibility, at every unrolled
    iteration (later iterations weigh more: they are the output). One scene
    per step (cycled), warmup+cosine LR; everything jitted.
    """
    import optax

    videos, tracks, visible = make_training_scenes(
        num_scenes, **(scene_kwargs or {})
    )
    videos_j = jnp.asarray(videos)
    tracks_j = jnp.asarray(tracks)
    visible_j = jnp.asarray(visible.astype(np.float32))

    params = init_matcher(key, dim=dim, radius=radius, hidden=hidden,
                          stride=stride, fhidden=fhidden, bank=bank)
    trainable = {"feature": params["feature"], "head": params["head"]}
    if bank > 0:
        trainable["select"] = params["select"]
    head = MatcherHead(radius=radius, hidden=hidden)
    fnet = MatcherFeatureNet(dim=dim, stride=stride, hidden=fhidden)
    tx = optax.adamw(
        optax.warmup_cosine_decay_schedule(
            0.0, learning_rate, 50, steps, learning_rate * 0.05
        )
    )
    opt_state = tx.init(trainable)

    def loss_fn(tr, key, video, gt_tracks, gt_visible):
        feats = fnet.apply({"params": tr["feature"]}, _to_gray01(video))
        template_vec = bilinear_sample(
            feats[:1], img_to_feat(gt_tracks[:, :1], stride)
        )[:, 0]
        # Perturbed starts: the runtime hands the head LK estimates that are
        # near-correct or drifted by a few px; train on that distribution
        # (the search reach is radius FEATURE px = radius*stride image px).
        reach = float(radius * stride)
        noise = jax.random.uniform(
            key, gt_tracks.shape, minval=-reach, maxval=reach
        )
        cost_multi = _make_cost_multi(feats, radius, stride, "xla")
        _, _, unrolled = _run_matcher(
            tr, head, cost_multi, feats, template_vec, gt_tracks + noise,
            stride, iterations, bank,
        )
        vis = gt_visible  # [N T]
        pos_loss = 0.0
        vis_loss = 0.0
        for it, (pred, vis_logit) in enumerate(unrolled):
            err = pred - gt_tracks
            huber = optax.huber_loss(err, delta=1.0).sum(-1)  # [N T]
            # Occluded (point, frame) pairs are a small minority of the
            # grid; unweighted BCE learns "predict visible" and occlusion
            # recall collapses (~0.45 measured). Upweight the occluded
            # class.
            bce = optax.sigmoid_binary_cross_entropy(vis_logit, vis)
            w = vis + occlusion_weight * (1.0 - vis)
            scale = 1.0 if it == len(unrolled) - 1 else 0.5
            pos_loss += scale * (huber * vis).sum() / jnp.maximum(
                vis.sum(), 1.0
            )
            vis_loss += scale * (bce * w).sum() / w.sum()
        return pos_loss + vis_loss, (pos_loss, vis_loss)

    @jax.jit
    def step(tr, opt_state, key, video, gt_tracks, gt_visible):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            tr, key, video, gt_tracks, gt_visible
        )
        updates, opt_state = tx.update(grads, opt_state, tr)
        tr = optax.apply_updates(tr, updates)
        return tr, opt_state, loss, aux

    log = []
    for i in range(steps):
        key, sk = jax.random.split(key)
        s = i % videos_j.shape[0]
        trainable, opt_state, loss, (pl_, vl_) = step(
            trainable, opt_state, sk, videos_j[s], tracks_j[s], visible_j[s]
        )
        if i % log_every == 0 or i == steps - 1:
            log.append(
                (i, float(loss), float(pl_), float(vl_))
            )
    params.update(trainable)
    return params, log


# Auto-engagement thresholds, calibrated on the synthetic scene family
# (docs/BENCHMARKS.md "Learned matcher" / "Camera zoom/roll" guidance):
# the matcher WINS under photometric degradation (noise >= ~12 uint8,
# contrast < ~45 p90-p10, exposure flicker) and mildly LOSES on clean or
# affine-motion content, so auto engages only on the former. The noise
# estimator is the 30th percentile of |horizontal second difference|
# / sqrt(6) (~0.37 sigma on this scene family) — spatial, hence invariant
# to camera/global motion (a temporal estimator mistakes pan for noise).
# The flicker estimator (median |second difference| of frame means) reads
# 0.063 on 15% exposure flicker vs <= 0.001 on clean / pan / a 60%-in-1s
# linear fade / a hard scene cut (regression-tested).
AUTO_NOISE_SIGMA = 12.0
AUTO_MIN_CONTRAST = 45.0
AUTO_FLICKER = 0.05
# Tracking-collapse signal: the photometric stats can't see regimes where
# the FRAMES look clean but classical tracking still fails (fast pan:
# points slide off their templates; the matcher improves pts-within-2
# 0.31 -> 0.48 there yet no photometric threshold fires). The classical
# tracker's own occluded-marking fraction separates cleanly on the full
# benchmark family: healthy regimes (clean / zoom / roll / jpeg / blur)
# mark 0.10-0.24 of (point, frame) pairs occluded, collapsed regimes
# (degraded 0.54, deform 0.69, pan 0.77, rot_strong 0.79) mark >= 0.54
# against true scene occlusion of 0.06-0.36. 0.45 splits the gap with
# >= 0.09 margin on both sides (measured 2026-08-18, grid 12, seeds as in
# examples/matcher_benchmark.py).
AUTO_LK_OCCLUDED_FRAC = 0.45


@jax.jit
def _degradation_stats(video):
    """(noise p30 of |d2x|/sqrt(6) on 4 frames, luma p90-p10, flicker).

    Jitted so the uint8->f32 conversions fuse into the reductions — no
    full-video f32 copy is ever materialized. Flicker is the MEDIAN
    |second difference of per-frame means| / mean: exposure flicker
    OSCILLATES (large second differences every frame) while legitimate
    global luma drift (a pan from bright to dark) is near-linear (second
    differences ~0 however fast the fade) and a scene cut contributes
    two outliers the median ignores — none false-engage the matcher.
    """
    v = jnp.asarray(video)
    if v.ndim == 4 and v.shape[-1] == 3:
        rgb_w = jnp.array([0.299, 0.587, 0.114], jnp.float32)

        def luma_of(frames):
            return frames.astype(jnp.float32) @ rgb_w
    else:
        def luma_of(frames):
            return frames.astype(jnp.float32).reshape(frames.shape[:3])

    idx = np.linspace(0, v.shape[0] - 1, min(4, v.shape[0])).astype(int)
    sub = luma_of(v[jnp.asarray(idx)])  # only 4 frames hit f32
    r = jnp.abs(sub[:, :, 2:] - 2 * sub[:, :, 1:-1] + sub[:, :, :-2])
    r = r / np.sqrt(6.0)
    noise_p30 = jnp.percentile(r, 30)
    contrast = jnp.percentile(sub, 90) - jnp.percentile(sub, 10)
    means = jnp.mean(luma_of(v), axis=(1, 2))  # fused reduce, no f32 copy
    if v.shape[0] < 3:
        # Fewer than 3 frames: no second difference exists. A median over
        # the empty array would be NaN, and NaN comparisons silently read
        # as "not degraded" downstream — make the decision defined instead.
        flicker = jnp.zeros((), jnp.float32)
    else:
        d2 = jnp.abs(means[2:] - 2.0 * means[1:-1] + means[:-2])
        flicker = jnp.median(d2) / (jnp.mean(means) + 1e-6)
    return noise_p30, contrast, flicker


def estimate_degradation(video) -> dict:
    """Cheap photometric-degradation estimate -> dict with ``degraded``.

    video: [T H W (3)] uint8/float, host or device array. Noise/contrast
    come from 4 sampled frames; flicker from per-frame means. All
    reductions run jitted on the video's device (only scalars are
    fetched — tunnel-safe for device-resident video).
    """
    noise_p30, contrast, flicker = _degradation_stats(video)
    noise_sigma = float(noise_p30) / 0.37
    contrast = float(contrast)
    flicker = float(flicker)
    return {
        "noise_sigma": noise_sigma,
        "contrast": contrast,
        "flicker": flicker,
        "degraded": (
            noise_sigma >= AUTO_NOISE_SIGMA
            or contrast < AUTO_MIN_CONTRAST
            or flicker > AUTO_FLICKER
        ),
    }


def default_matcher_path() -> str:
    """Path of the shipped pretrained matcher (tdspa/assets).

    Template-bank model (bank=3), trained round 4 on 48 24-frame scenes
    with deformation (amp <= 5 px) and camera-roll (<= 2.5 deg/frame)
    augmentation, occlusion weight 8, 4000 steps — regenerate with::

        python -m tdspa.features.matcher /path/out.npz

    (the __main__ defaults below ARE this recipe).

    Measured with the default motion-field rescue over the full
    qualification family (examples/matcher_benchmark.py, 2026-08-19 —
    docs/BENCHMARKS.md "Shipped round-4 matcher"): degraded pts_within_2
    0.942 (classical 0.728), deform 0.915 (0.544), rot_strong 0.513
    (0.438), blur_noise 0.905 (0.883); forced-on clean 0.956 vs 0.952 —
    the matcher no longer degrades clean content.
    """
    import os

    return os.path.join(os.path.dirname(__file__), "..", "assets",
                        "matcher_default.npz")


def save_matcher(path: str, params) -> None:
    """Flat-npz save (same layout family as tdspa.infer.checkpoint)."""
    flat = {}

    def walk(prefix, tree):
        for k, v in tree.items():
            name = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                walk(name, v)
            else:
                flat[name] = np.asarray(v)

    walk("", params)
    np.savez(path, **flat)


def load_matcher(path: str):
    """Inverse of save_matcher."""
    if path == "default":
        path = default_matcher_path()
    data = np.load(path)
    tree: dict = {}
    for key in data.files:
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(data[key])
    return tree


if __name__ == "__main__":
    # Regenerate the shipped matcher: python -m tdspa.features.matcher out.npz
    # (defaults = the round-4 shipped recipe; see default_matcher_path).
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("out", nargs="?", default=default_matcher_path())
    ap.add_argument("--bank", type=int, default=3)
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--iterations", type=int, default=2)
    ap.add_argument("--num_scenes", type=int, default=48)
    ap.add_argument("--num_frames", type=int, default=24,
                    help="training-scene length; longer scenes teach the "
                         "bank's selection about late-frame template "
                         "staleness (the round-4 deform limiter)")
    ap.add_argument("--occlusion_weight", type=float, default=8.0)
    ap.add_argument("--rot_rate_max_deg", type=float, default=2.5,
                    help="camera-roll augmentation (deg/frame max; every "
                         "third scene); 0 disables")
    ap.add_argument("--deform_amp_max", type=float, default=5.0,
                    help="non-rigid warp augmentation (px max; every other "
                         "scene) — the bank's learned selection needs "
                         "deforming scenes to see when fresh templates beat "
                         "frame 0; 0 disables")
    ap.add_argument("--natural_frac", type=float, default=0.5,
                    help="fraction of scenes with the multi-octave 'natural' "
                         "texture + camera-response gamma (photographic-"
                         "statistics regime; 0 regenerates the round-4 "
                         "cells-only distribution)")
    args = ap.parse_args()
    scene_kwargs = {"num_frames": args.num_frames}
    if args.rot_rate_max_deg > 0.0:
        scene_kwargs["rot_rate_max"] = float(np.deg2rad(args.rot_rate_max_deg))
    if args.deform_amp_max > 0.0:
        scene_kwargs["deform_amp_max"] = args.deform_amp_max
    if args.natural_frac > 0.0:
        scene_kwargs["natural_frac"] = args.natural_frac
    p, train_log = train_matcher(
        jax.random.PRNGKey(args.seed), steps=args.steps, bank=args.bank,
        iterations=args.iterations, occlusion_weight=args.occlusion_weight,
        num_scenes=args.num_scenes, scene_kwargs=scene_kwargs,
    )
    save_matcher(args.out, p)
    print(f"saved {args.out} (bank={args.bank}); "
          f"loss {train_log[0][1]:.3f} -> {train_log[-1][1]:.3f}")
