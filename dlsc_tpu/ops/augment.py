"""Device-side augmentation: crops, SpecAugment, Mixup, BC mixing.

The reference does all of this per-item on the host with Python's global RNG
inside DataLoader workers (reference: src/datasets/preprocessing.py:795-1110,
src/datasets/esc50.py:43-76, 225-289). Here every augmentation is a pure,
static-shaped JAX function over a *batch* with explicit PRNG keys, so the
whole pipeline runs inside the jitted train step on device.

Documented deviations from the reference (behavioral, not numerical):

- Mixup / BC partners are drawn from the current batch rather than the whole
  dataset — the standard device-side idiom; statistically equivalent for
  shuffled loaders. Each sample draws an *independent* partner uniform over
  the other B-1 batch elements (per-sample offset, never self), mirroring the
  reference's independent per-sample draw (esc50.py:64-76,
  preprocessing.py:584-592).
- Reference Mixup writes ``soft[l1]=λ; soft[l2]=1-λ``, which produces a
  non-normalized label when the two samples share a class (esc50.py:69-72 can
  sample same-class partners). We use the convex combination
  ``λ·y1 + (1-λ)·y2`` which is identical for distinct classes and correctly
  normalized otherwise.
- BC mixing in the reference always finds a different-class partner
  (preprocessing.py:584-592); with in-batch partners we fall back to "no mix"
  (r=1) when the partner happens to share the class.
- Reference time-stretch changes the sequence length after cropping
  (preprocessing.py:897-916) which only works because the augmentation is
  disabled in every shipped config; our version stretches *then* re-crops to
  the static window so XLA shapes stay fixed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def one_hot(labels: jax.Array, num_classes: int) -> jax.Array:
    return jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)


def pad_or_trim(wave: jax.Array, target_len: int) -> jax.Array:
    """Wrap-pad short clips / center-trim long ones to ``target_len``
    (reference: src/utils/audio.py:134-152). Works on (..., T)."""
    T = wave.shape[-1]
    if T == target_len:
        return wave
    if T < target_len:
        reps = -(-target_len // T)
        tiled = jnp.concatenate([wave] * reps, axis=-1)
        return jax.lax.slice_in_dim(tiled, 0, target_len, axis=-1)
    start = (T - target_len) // 2
    return jax.lax.slice_in_dim(wave, start, start + target_len, axis=-1)


# --------------------------------------------------------------------------- #
# Waveform crops (reference: preprocessing.py:829-884)
# --------------------------------------------------------------------------- #
def random_crop(wave: jax.Array, key: jax.Array, window: int) -> jax.Array:
    """Per-sample random window from padded waveforms. (B, T) → (B, window)."""
    B, T = wave.shape
    if T <= window:
        return jnp.pad(wave, ((0, 0), (0, window - T)))
    starts = jax.random.randint(key, (B,), 0, T - window + 1)
    return _gather_windows(wave, starts, window)


def center_crop(wave: jax.Array, window: int) -> jax.Array:
    T = wave.shape[-1]
    if T <= window:
        pad = [(0, 0)] * (wave.ndim - 1) + [(0, window - T)]
        return jnp.pad(wave, pad)
    start = (T - window) // 2
    return jax.lax.slice_in_dim(wave, start, start + window, axis=-1)


def multi_crop(wave: jax.Array, window: int, n_crops: int = 10) -> jax.Array:
    """Evenly-spaced test-time crops. (B, T) → (B, n_crops, window).

    Start indices replicate ``torch.linspace(0, max_start, n).long()``
    (truncation, reference: preprocessing.py:876-884).
    """
    B, T = wave.shape
    if T <= window:
        padded = jnp.pad(wave, ((0, 0), (0, window - T)))
        return jnp.broadcast_to(padded[:, None, :], (B, n_crops, window))
    max_start = T - window
    starts = jnp.floor(jnp.linspace(0.0, float(max_start), n_crops)).astype(jnp.int32)
    idx = starts[:, None] + jnp.arange(window)[None, :]
    return wave[:, idx]


def _gather_windows(wave: jax.Array, starts: jax.Array, window: int) -> jax.Array:
    def one(w, s):
        return jax.lax.dynamic_slice_in_dim(w, s, window)

    return jax.vmap(one)(wave, starts)


# --------------------------------------------------------------------------- #
# Waveform augmentation (reference: preprocessing.py:886-925)
# --------------------------------------------------------------------------- #
def time_stretch(
    wave: jax.Array, key: jax.Array, low: float, high: float, prob: float = 0.5
) -> jax.Array:
    """Linear-interpolation time stretch (matches F.interpolate linear,
    align_corners=False semantics), re-cropped/padded to the input length so
    the shape stays static. Per-sample factor ~ U(low, high), gate ``prob``."""
    B, T = wave.shape
    k_gate, k_fac = jax.random.split(key)
    gate = jax.random.uniform(k_gate, (B,)) < prob
    factor = jax.random.uniform(k_fac, (B,), minval=low, maxval=high)

    # Evaluate the stretched signal on the original grid: output position i
    # samples input at (i + 0.5) * factor - 0.5 (align_corners=False).
    def one(w, f):
        pos = (jnp.arange(T) + 0.5) * f - 0.5
        lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, T - 1)
        hi = jnp.clip(lo + 1, 0, T - 1)
        frac = jnp.clip(pos - lo, 0.0, 1.0)
        vals = w[lo] * (1 - frac) + w[hi] * frac
        # positions past the (shortened) end are zero, like crop-then-pad
        return jnp.where(pos <= T - 1, vals, 0.0)

    stretched = jax.vmap(one)(wave, factor)
    return jnp.where(gate[:, None], stretched, wave)


def gain_shift(
    wave: jax.Array, key: jax.Array, low_db: float, high_db: float, prob: float = 0.5
) -> jax.Array:
    """Random gain in dB, per sample, gate ``prob`` (reference :917-925)."""
    B = wave.shape[0]
    k_gate, k_gain = jax.random.split(key)
    gate = jax.random.uniform(k_gate, (B,)) < prob
    gain_db = jax.random.uniform(k_gain, (B,), minval=low_db, maxval=high_db)
    gain = 10.0 ** (gain_db / 20.0)
    return jnp.where(gate[:, None], wave * gain[:, None], wave)


# --------------------------------------------------------------------------- #
# SpecAugment (reference quirk version: preprocessing.py:1080-1110)
# --------------------------------------------------------------------------- #
def spec_augment(
    spec: jax.Array,
    key: jax.Array,
    time_mask: int = 192,
    freq_mask: int = 48,
) -> jax.Array:
    """One time mask + one freq mask, zero fill, per sample.

    Mask length ~ randint[1, min(param, dim//4)] and start
    ~ randint[0, dim-len], replicating the reference's custom SpecAugment
    (NOT torchaudio's iid-per-bin variant). spec: (B, n_mels, T).
    """
    B, F, T = spec.shape

    def one(s, k):
        kt1, kt2, kf1, kf2 = jax.random.split(k, 4)
        out = s
        if time_mask > 0 and T > time_mask:
            cap = min(time_mask, T // 4)
            tlen = jax.random.randint(kt1, (), 1, cap + 1)
            tstart = jax.random.randint(kt2, (), 0, T - tlen + 1)
            tidx = jnp.arange(T)
            tmask = (tidx >= tstart) & (tidx < tstart + tlen)
            out = jnp.where(tmask[None, :], 0.0, out)
        if freq_mask > 0 and F > freq_mask:
            cap = min(freq_mask, F // 4)
            flen = jax.random.randint(kf1, (), 1, cap + 1)
            fstart = jax.random.randint(kf2, (), 0, F - flen + 1)
            fidx = jnp.arange(F)
            fmask = (fidx >= fstart) & (fidx < fstart + flen)
            out = jnp.where(fmask[:, None], 0.0, out)
        return out

    return jax.vmap(one)(spec, jax.random.split(key, B))


# --------------------------------------------------------------------------- #
# Image augmentation for the spectrogram-image CNN
# (reference: preprocessing.py:1473-1478 — RandomH/VFlip + RandomAffine)
# --------------------------------------------------------------------------- #
def image_flip_translate(
    img: jax.Array, key: jax.Array, translate: float = 0.1
) -> jax.Array:
    """Per-sample random horizontal/vertical flips (p=0.5 each) and integer
    translation up to ±translate·dim, zero-filled. img: (B, H, W)."""
    B, H, W = img.shape
    kh, kv, kx, ky = jax.random.split(key, 4)
    hflip = jax.random.bernoulli(kh, 0.5, (B,))
    vflip = jax.random.bernoulli(kv, 0.5, (B,))
    max_dx, max_dy = int(translate * W), int(translate * H)
    dx = jax.random.randint(kx, (B,), -max_dx, max_dx + 1)
    dy = jax.random.randint(ky, (B,), -max_dy, max_dy + 1)

    def one(im, hf, vf, tx, ty):
        im = jnp.where(hf, im[:, ::-1], im)
        im = jnp.where(vf, im[::-1, :], im)
        rows = jnp.arange(H)[:, None] - ty
        cols = jnp.arange(W)[None, :] - tx
        valid = (rows >= 0) & (rows < H) & (cols >= 0) & (cols < W)
        shifted = im[jnp.clip(rows, 0, H - 1), jnp.clip(cols, 0, W - 1)]
        return jnp.where(valid, shifted, 0.0)

    return jax.vmap(one)(img, hflip, vflip, dx, dy)


def _random_partners(key: jax.Array, batch: int) -> jax.Array:
    """Per-sample random partner indices, uniform over the other batch
    elements (never self): partner[i] = (i + offset_i) mod B with
    offset_i ~ U{1..B-1}. Mirrors the reference's independent per-sample
    partner draw (esc50.py:64-76, preprocessing.py:584-592)."""
    if batch <= 1:
        return jnp.zeros((batch,), jnp.int32)
    offsets = jax.random.randint(key, (batch,), 1, batch)
    return (jnp.arange(batch) + offsets) % batch


# --------------------------------------------------------------------------- #
# Mixup (reference: preprocessing.py:928-968, esc50.py:43-76)
# --------------------------------------------------------------------------- #
def mixup(
    spec: jax.Array,
    labels: jax.Array,
    key: jax.Array,
    alpha: float = 0.5,
    prob: float = 0.25,
) -> tuple[jax.Array, jax.Array]:
    """Batch Mixup with soft labels.

    ``prob`` defaults to 0.25: the reference double-gates (0.5 in
    MixupDataset.apply_mixup x 0.5 in MixupAugmentation), giving an effective
    mix probability of 1/4. labels: (B, C) one-hot/soft.

    ``alpha`` may be a traced scalar (vmapped per-trial HPO threads a
    per-slot Beta α through here); a traced α must be > 0 — the α<=0
    "mixup off" escape is only taken for static Python values.
    """
    B = spec.shape[0]
    k_gate, k_lam, k_perm = jax.random.split(key, 3)
    gate = jax.random.uniform(k_gate, (B,)) < prob
    lam = (
        jnp.ones((B,))
        if isinstance(alpha, (int, float)) and alpha <= 0
        else jax.random.beta(k_lam, alpha, alpha, (B,))
    )
    partner = _random_partners(k_perm, B)
    lam_eff = jnp.where(gate, lam, 1.0)
    lshape = (B,) + (1,) * (spec.ndim - 1)
    mixed = lam_eff.reshape(lshape) * spec + (1 - lam_eff).reshape(lshape) * spec[partner]
    soft = lam_eff[:, None] * labels + (1 - lam_eff[:, None]) * labels[partner]
    return mixed, soft


# --------------------------------------------------------------------------- #
# Between-Class mixing (reference: preprocessing.py:391-527, 564-609)
# --------------------------------------------------------------------------- #
def _rms_spl_db(wave: jax.Array) -> jax.Array:
    """RMS-proxy 'A-weighted SPL' in dB (reference :395-419): 20·log10(rms)+94,
    -80 for silence. wave: (B, T) → (B,)."""
    rms = jnp.sqrt(jnp.mean(wave**2, axis=-1))
    return jnp.where(rms > 0, 20.0 * jnp.log10(jnp.maximum(rms, 1e-20)) + 94.0, -80.0)


def _perceptual_coefficient(r: jax.Array, spl1: jax.Array, spl2: jax.Array) -> jax.Array:
    """Loudness-aware adjustment of the mixing ratio (reference :422-447):
    if |Δspl| > 10 dB, scale r by (1 ∓ min(|Δspl|/40, 0.3)), clamp [0, 1]."""
    diff = spl1 - spl2
    adj = jnp.minimum(jnp.abs(diff) / 40.0, 0.3)
    scaled = jnp.where(diff > 0, r * (1 - adj), r * (1 + adj))
    p = jnp.where(jnp.abs(diff) > 10.0, scaled, r)
    return jnp.clip(p, 0.0, 1.0)


def bc_mix(
    wave: jax.Array,
    labels: jax.Array,
    key: jax.Array,
    num_classes: int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Between-Class learning mix (Tokozume 2018, as implemented by the
    reference): r ~ U(0,1); perceptually-adjusted coefficient p; waveforms
    mixed as (p·x1 + (1-p)·x2)/sqrt(p² + (1-p)²); labels soft-mixed with the
    *raw* r (reference :594-609). Partners sharing a class are left unmixed.

    wave: (B, T); labels: (B, C) one-hot. Applied on every training sample
    (the reference has no probability gate for BC).
    """
    del num_classes
    B = wave.shape[0]
    k_r, k_perm = jax.random.split(key)
    partner = _random_partners(k_perm, B)
    r = jax.random.uniform(k_r, (B,))

    same_class = jnp.argmax(labels, -1) == jnp.argmax(labels[partner], -1)
    r = jnp.where(same_class, 1.0, r)

    spl1 = _rms_spl_db(wave)
    spl2 = spl1[partner]
    p = _perceptual_coefficient(r, spl1, spl2)
    p = jnp.where(same_class, 1.0, p)

    norm = jnp.sqrt(p**2 + (1 - p) ** 2)
    mixed = (p[:, None] * wave + (1 - p)[:, None] * wave[partner]) / norm[:, None]
    soft = r[:, None] * labels + (1 - r)[:, None] * labels[partner]
    return mixed, soft
