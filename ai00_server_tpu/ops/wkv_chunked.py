"""Matrix (MXU) form of the WKV recurrences over sequence chunks.

The Pallas scan kernel (wkv_pallas.py) fixes the HBM-traffic problem but
still steps token-by-token on the VPU.  This module reformulates the
recurrences so the sequence dimension becomes MXU matmuls — the standard
chunked linear-attention derivation:

v5/v6 (diagonal decay): with per-token log-decay ``g_t = log w_t`` and
inclusive cumsum ``c_t`` over a sub-chunk,

    S_t   = exp(c_t) . S_in  +  sum_{s<=t} exp(c_t - c_s) k_s v_s^T
    y_t   = (r_t . exp(c_{t-1})) @ S_in                       [inter, MXU]
          + sum_{s<t} (sum_n r_tn exp(c_{t-1,n} - c_{s,n}) k_sn) v_s
                                                              [intra]
          + (r_t . u . k_t) v_t                               [diagonal]
    S_out = exp(c_R) . S_in + (k . exp(c_R - c))^T @ V        [carry, MXU]

Every exp argument is a true suffix-sum of log-decays and therefore <= 0:
no overflow for any decay magnitude (the r~/k~ factorization that divides
by cumdecay explodes for strong decay; this form never does).  Sub-chunks
of R tokens run under ``lax.scan`` carrying S; the intra term materializes
an (R, R, N) decay-ratio tensor per (B, H) — R is kept small (16).

v7 (delta rule): the transition is ``M_t = diag(w_t) - kk_t (kk_t.a_t)^T``.
Substituting ``S_t = Z_t diag(A_t)`` (A = cumprod of decay within the
sub-chunk) turns it into the decay-free DeltaNet update
``Z_t = Z_{t-1}(I - kb_t bb_t^T) + v_t kd_t^T`` whose chunk product has
the WY representation (Yang et al., "Parallelizing Linear Transformers
with the Delta Rule"): one unit-lower-triangular solve of size R per
chunk, then everything is MXU matmuls.  The normalization divides by A —
safe for RWKV-7 because its decay is bounded below per step
(``w = exp(-exp(-0.5) sigmoid(..)) >= 0.545``), so ``1/A <= 1.7e4`` for
R = 16 sub-chunks; the math does not apply to unbounded-decay families
(v5/v6 use the suffix-sum form above instead).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

SUBCHUNK = 16


@functools.partial(jax.jit, static_argnames=("subchunk",))
def wkv56_chunk_mm(S, r, k, v, w, u, mask, subchunk=SUBCHUNK):
    """Same contract as models.v5.wkv_scan / wkv_pallas.wkv56_chunk.

    S: (B, H, N, N) f32 (k-major); r,k,v,w: (B, T, H, N); u: (H, N);
    mask: (B, T) bool.  Returns (new_S, y (B, T, H, N) f32).
    """
    B, T, H, N = r.shape
    R = min(subchunk, T)
    Tp = -(-T // R) * R

    f32 = jnp.float32
    r = r.astype(f32)
    k = k.astype(f32)
    v = v.astype(f32)
    w = w.astype(f32)
    u = u.astype(f32)

    # Fold the suffix mask: masked steps are identity (w=1, k=0); pad T.
    m = mask[:, :, None, None]
    w = jnp.where(m, w, 1.0)
    k = jnp.where(m, k, 0.0)

    def pad(x, fill):
        if Tp == T:
            return x
        return jnp.concatenate(
            [x, jnp.full((B, Tp - T, H, N), fill, f32)], axis=1)

    r, k, v, w = pad(r, 0.0), pad(k, 0.0), pad(v, 0.0), pad(w, 1.0)

    nsub = Tp // R
    # (B, nsub, R, H, N) -> time-major over sub-chunks for the scan.
    def sub(x):
        return jnp.moveaxis(x.reshape(B, nsub, R, H, N), 1, 0)

    rs, ks, vs, ws = sub(r), sub(k), sub(v), sub(w)
    # NB: 1e-38 is subnormal and gets flushed to zero on TPU — the clamp
    # must stay in the normal range or log() produces -inf.
    glog = jnp.log(jnp.maximum(ws, 1e-30))  # (nsub, B, R, H, N)

    tri_strict = jnp.tril(jnp.ones((R, R), f32), -1)  # s < t

    def body(S, xs):
        rb, kb, vb, gb = xs                     # (B, R, H, N)
        c = jnp.cumsum(gb, axis=1)              # inclusive c_t
        c_prev = c - gb                         # c_{t-1}
        cR = c[:, -1]                           # (B, H, N)

        r_dec = rb * jnp.exp(c_prev)
        # inter: (B,R,H,N) @ (B,H,N,V) -> (B,R,H,V)
        y = jnp.einsum("brhn,bhnv->brhv", r_dec, S,
                       preferred_element_type=f32)

        # intra: D[t,s,n] = exp(c_prev[t,n] - c[s,n]) for s<t (suffix sums
        # of negative logs -> exponent <= 0, never overflows).
        diff = c_prev[:, :, None] - c[:, None]  # (B, R, R, H, N)
        D = jnp.exp(jnp.minimum(diff, 0.0))
        A = jnp.einsum("bthn,btshn,bshn->bhts", rb, D, kb,
                       preferred_element_type=f32)
        A = A * tri_strict[None, None]
        y = y + jnp.moveaxis(
            jnp.einsum("bhts,bshv->bthv", A, vb,
                       preferred_element_type=f32), 0, 0)

        # diagonal bonus: (r . u . k) v
        bonus = jnp.einsum("bthn,hn,bthn->bth", rb, u, kb,
                           preferred_element_type=f32)
        y = y + bonus[..., None] * vb

        # carry: S' = exp(cR) . S + (k . exp(cR - c))^T @ V
        khat = kb * jnp.exp(cR[:, None] - c)
        S = S * jnp.exp(cR)[..., None] + jnp.einsum(
            "bthn,bthv->bhnv", khat, vb, preferred_element_type=f32)
        return S, y

    S, ys = jax.lax.scan(body, S.astype(f32), (rs, ks, vs, glog))
    # (nsub, B, R, H, N) -> (B, T, H, N)
    y = jnp.moveaxis(ys, 0, 1).reshape(B, Tp, H, N)[:, :T]
    return S, y


@functools.partial(jax.jit, static_argnames=("subchunk",))
def wkv7_chunk_mm(S, r, w, k, v, kk, a, mask, subchunk=SUBCHUNK):
    """Chunked WY form of the v7 delta-rule recurrence (see module doc).

    Same contract as models.v7._wkv_scan: S (B, H, N, N) f32 laid out
    (v-dim, k-dim); r, w, k, v, kk, a: (B, T, H, N); mask: (B, T) bool.
    Returns (new_S, y (B, T, H, N) f32).
    """
    B, T, H, N = r.shape
    R = min(subchunk, T)
    Tp = -(-T // R) * R
    f32 = jnp.float32

    r, k, v, w, kk, a = (x.astype(f32) for x in (r, k, v, w, kk, a))
    m = mask[:, :, None, None]
    # Identity steps for masked/padded positions: w=1, k=0, kk=0.
    w = jnp.where(m, w, 1.0)
    k = jnp.where(m, k, 0.0)
    kk = jnp.where(m, kk, 0.0)

    def pad(x, fill):
        if Tp == T:
            return x
        return jnp.concatenate(
            [x, jnp.full((B, Tp - T, H, N), fill, f32)], axis=1)

    r, k, v, kk, a = (pad(x, 0.0) for x in (r, k, v, kk, a))
    w = pad(w, 1.0)

    nsub = Tp // R

    def sub(x):  # -> (nsub, B, H, R, N): head-major for batched matmuls
        return jnp.moveaxis(
            x.reshape(B, nsub, R, H, N), (1, 3), (0, 2))

    rs, ks, vs, ws, kks, as_ = (sub(x) for x in (r, k, v, w, kk, a))

    tri_s = jnp.tril(jnp.ones((R, R), f32), -1)   # strict (j < t)
    tri_i = jnp.tril(jnp.ones((R, R), f32))       # inclusive (s <= t)
    eye = jnp.eye(R, dtype=f32)

    def body(Z, xs):
        rb, kb, vb, wb, kkb, ab = xs              # (B, H, R, N)
        clog = jnp.cumsum(jnp.log(jnp.maximum(wb, 1e-30)), axis=2)
        A = jnp.exp(clog)                          # inclusive cumdecay
        Aprev = jnp.exp(clog - jnp.log(jnp.maximum(wb, 1e-30)))

        beta = kkb * ab
        kbar = Aprev * kkb                         # removal key, decayed
        bbar = beta / A                            # 1/A bounded (doc)
        kdec = kb / A
        rbar = rb * A

        def mm(x, y):  # (B,H,R,N) @ (B,H,N,M)
            return jnp.einsum("bhrn,bhnm->bhrm", x, y,
                              preferred_element_type=f32)

        def mmT(x, y):  # (B,H,R,N) @ (B,H,S,N)^T -> (B,H,R,S)
            return jnp.einsum("bhrn,bhsn->bhrs", x, y,
                              preferred_element_type=f32)

        Cb = mmT(kbar, bbar) * tri_s               # Cb[t,j] = bbar_j . kbar_t
        Ck = mmT(kbar, kdec) * tri_s               # Ck[t,j] = kdec_j . kbar_t
        ZT = jnp.swapaxes(Z, -1, -2)               # (B,H,N_k,N_v)
        rhs = -(mm(kbar, ZT) + jnp.einsum(
            "bhts,bhsv->bhtv", Ck, vb, preferred_element_type=f32))
        # (I + tril_strict(Cb)) D = rhs.  Cb is strictly lower, hence
        # nilpotent: the inverse is the EXACT finite Neumann product
        # (I - Cb)(I + Cb^2)(I + Cb^4)... — log2(R) batched matmuls beat
        # XLA's sequential TriangularSolve on TPU by a wide margin.
        Ap = -Cb
        inv = eye + Ap
        steps = max(1, (R - 1).bit_length() - 1)
        for _ in range(steps):
            Ap = jnp.einsum("bhts,bhsu->bhtu", Ap, Ap,
                            preferred_element_type=f32)
            inv = inv + jnp.einsum("bhts,bhsu->bhtu", inv, Ap,
                                   preferred_element_type=f32)
        D = jnp.einsum("bhts,bhsv->bhtv", inv, rhs,
                       preferred_element_type=f32)

        Y = mm(rbar, ZT)
        Y = Y + jnp.einsum("bhts,bhsv->bhtv", mmT(rbar, bbar) * tri_i, D,
                           preferred_element_type=f32)
        Y = Y + jnp.einsum("bhts,bhsv->bhtv", mmT(rbar, kdec) * tri_i, vb,
                           preferred_element_type=f32)

        # Z_R = Z + D^T Bbar + V^T Kdec ; un-normalize into S columns.
        Znew = Z + jnp.einsum("bhtv,bhtn->bhvn", D, bbar,
                              preferred_element_type=f32) \
                 + jnp.einsum("bhtv,bhtn->bhvn", vb, kdec,
                              preferred_element_type=f32)
        S_out = Znew * A[:, :, -1][:, :, None, :]  # scale columns by A_R
        return S_out, Y

    S, ys = jax.lax.scan(body, S.astype(f32), (rs, ks, vs, ws, kks, as_))
    # ys: (nsub, B, H, R, N) -> (B, T, H, N)
    y = jnp.moveaxis(ys, (0, 2, 3), (1, 3, 2)).reshape(B, Tp, H, N)[:, :T]
    return S, y
