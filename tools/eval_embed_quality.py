"""Real-data embedding-quality eval.

Trains a small RWKV v7 byte-level LM on the repo's own documentation
(real English prose, ~150 KB), embeds real text passages through the
SAME state readout the ``/api/oai/embeddings`` endpoint serves
(server/app.py _embed_texts: normalized [mean att_x | mean ffn_x |
wkv uniform-query readout]), and measures passage retrieval: queries
are spans sampled from passages, recall@k = fraction of queries whose
SOURCE passage ranks in the top-k by cosine.

Three retrieval paths are compared at equal index memory:
  * exact    — cosine top-k over the state embeddings
  * ivf      — the int8 IVF index (the 10M-scale path, ops/retrieval)
  * tfidf    — hashed char-3-gram TF-IDF baseline (the offline stand-in
               for the reference's fastembed ONNX sidecar, whose HF
               weights need network access; crates/ai00-server
               config.rs:82-157)

Usage:
    python tools/eval_embed_quality.py               # full (train ~min)
    EVAL_STEPS=60 EVAL_PASSAGES=48 python ...        # quick

Emits one JSON line with recall@{1,10} + MRR per method.  The trained
checkpoint caches under /tmp keyed by the training config.
"""

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_corpus() -> bytes:
    """Real English prose from the repo's own documentation."""
    paths = [os.path.join(REPO, p) for p in
             ("README.md", "SURVEY.md", "BASELINE.md", "VERDICT.md",
              "ROUND1.md", "ROUND2.md", "ROUND3.md")]
    paths += sorted(glob.glob(os.path.join(REPO, "docs", "*.md")))
    text = []
    for p in paths:
        if os.path.exists(p):
            with open(p, "rb") as f:
                text.append(f.read())
    return b"\n\n".join(text)


def split_passages(corpus: bytes, size: int, n: int, seed=0):
    """n non-overlapping passages of ``size`` bytes."""
    starts = np.arange(0, len(corpus) - size, size)
    rng = np.random.default_rng(seed)
    pick = rng.permutation(len(starts))[:n]
    return [bytes(corpus[starts[i]:starts[i] + size]) for i in pick]


def make_queries(passages, span: int, seed=1):
    rng = np.random.default_rng(seed)
    out = []
    for p in passages:
        off = int(rng.integers(0, max(1, len(p) - span)))
        out.append(p[off:off + span])
    return out


# ---------------------------------------------------------------- model


def train_model(corpus: bytes, n_layer=4, n_embd=256, steps=400,
                batch=16, seqlen=256, lr=3e-4, seed=0, log=True):
    """Train a tiny RWKV v7 byte LM with next-byte cross-entropy through
    the production forward (models/v7.forward over stacked params)."""
    import jax
    import jax.numpy as jnp
    import optax

    from ai00_server_tpu.loader import stack_params
    from ai00_server_tpu.models import v7
    from ai00_server_tpu.models.info import ModelVersion
    from ai00_server_tpu.testing import make_raw_weights, tiny_info

    info = tiny_info(ModelVersion.V7, num_layer=n_layer, num_emb=n_embd,
                     head_size=64, num_vocab=256)
    raw = make_raw_weights(info, seed=seed, dtype=np.float32)
    # make_raw_weights is a parity-test fixture (std 0.4 everywhere);
    # rescale matrices to trainable magnitudes: std 1/sqrt(fan_in) for
    # every linear, small embedding/head.
    for k, v in raw.items():
        if getattr(v, "ndim", 0) == 2:
            raw[k] = v * (1.0 / np.sqrt(v.shape[0])) / 0.4
    raw["emb.weight"] = raw["emb.weight"] * 0.5
    params = stack_params(info, raw, dtype=jnp.float32)

    data = np.frombuffer(corpus, np.uint8).astype(np.int32)
    rng = np.random.default_rng(seed)

    def sample_batch():
        off = rng.integers(0, len(data) - seqlen - 1, size=batch)
        x = np.stack([data[o:o + seqlen] for o in off])
        y = np.stack([data[o + 1:o + seqlen + 1] for o in off])
        return jnp.asarray(x), jnp.asarray(y)

    is_float = lambda x: hasattr(x, "dtype") and \
        jnp.issubdtype(x.dtype, jnp.floating)
    opt = optax.adamw(lr, weight_decay=1e-4)
    opt_state = opt.init(jax.tree.map(
        lambda x: x if is_float(x) else None, params,
        is_leaf=lambda x: not isinstance(x, dict)))

    lengths = jnp.full((batch,), seqlen, jnp.int32)

    def loss_fn(p, x, y):
        state = v7.init_state(info, batch, jnp.float32)
        h, _ = v7.forward(p, state, x, lengths)
        logits = h @ p["head"].astype(h.dtype)
        ls = jax.nn.log_softmax(logits.astype(jnp.float32))
        nll = -jnp.take_along_axis(ls, y[..., None], -1)
        return nll.mean()

    @jax.jit
    def step(p, o, x, y):
        # allow_int: stacked params carry int leaves (layer_index,
        # quant codes); their float0 grads are masked to None below.
        loss, g = jax.value_and_grad(loss_fn, allow_int=True)(p, x, y)
        g = jax.tree.map(lambda gi, pi: gi if is_float(pi) else None,
                         g, p, is_leaf=lambda t: not isinstance(t, dict))
        upd, o = opt.update(g, o, p)
        p = jax.tree.map(
            lambda pi, ui: pi + ui if ui is not None else pi, p, upd,
            is_leaf=lambda t: not isinstance(t, dict))
        return p, o, loss

    t0 = time.time()
    for i in range(steps):
        x, y = sample_batch()
        params, opt_state, loss = step(params, opt_state, x, y)
        if log and (i % 50 == 0 or i == steps - 1):
            print(f"step {i}: loss {float(loss):.3f} "
                  f"({time.time()-t0:.0f}s)", file=sys.stderr)
    return info, params


# ------------------------------------------------------------ embedding


def embed_texts(info, params, texts, batch=16, chunk=128):
    """Both /api/oai/embeddings readouts, computed directly:

    * ``hidden_mean`` — masked mean over ALL positions of the final
      (post-ln_out) hidden states, the engine's pooled readout (the
      standard LM sentence-embedding recipe; the whole passage
      contributes equally).
    * ``state_pool`` — the legacy final-state pooling (normalized
      [mean att_x | mean ffn_x | wkv uniform-query readout]); the
      recurrent state at the END of a text mostly reflects its recent
      tokens, which this eval showed carries ~random passage-retrieval
      signal (BASELINE.md).
    """
    import jax.numpy as jnp

    from ai00_server_tpu.models import v7

    vecs = []
    hvecs = []
    for i in range(0, len(texts), batch):
        group = texts[i:i + batch]
        B = len(group)
        toks = [np.frombuffer(t, np.uint8).astype(np.int32) for t in group]
        state = v7.init_state(info, B, jnp.float32)
        maxlen = max(len(t) for t in toks)
        hsum = np.zeros((B, info.num_emb), np.float32)
        hcnt = np.zeros(B, np.float32)
        for off in range(0, maxlen, chunk):
            T = min(chunk, maxlen - off)
            x = np.zeros((B, T), np.int32)
            lens = np.zeros(B, np.int32)
            for b, t in enumerate(toks):
                n = max(0, min(T, len(t) - off))
                if n:
                    x[b, :n] = t[off:off + n]
                    lens[b] = n
            h, state = v7.forward(params, state,
                                  jnp.asarray(x), jnp.asarray(lens))
            h = np.asarray(h, np.float32)              # (B, T, C)
            valid = (np.arange(T)[None, :] < lens[:, None])
            hsum += (h * valid[..., None]).sum(1)
            hcnt += lens
        hv = hsum / np.maximum(hcnt, 1.0)[:, None]
        hv /= np.maximum(np.linalg.norm(hv, axis=1, keepdims=True), 1e-12)
        hvecs.extend(hv)
        att = np.asarray(state["att_x"], np.float32)   # (L, B, C)
        ffn = np.asarray(state["ffn_x"], np.float32)
        wkv = np.asarray(state["wkv"], np.float32)     # (L, B, H, N, N)
        for b in range(B):
            parts = [att[:, b].mean(0), ffn[:, b].mean(0),
                     wkv[:, b].sum(-1).mean(0).reshape(-1)]
            v = np.concatenate([
                p / max(float(np.linalg.norm(p)), 1e-12) for p in parts])
            vecs.append(v / max(float(np.linalg.norm(v)), 1e-12))
    return np.stack(hvecs), np.stack(vecs)


def tfidf_vectors(texts, dim=4096, seed=0):
    """Hashed char-3-gram TF-IDF, L2-normalized."""
    counts = np.zeros((len(texts), dim), np.float32)
    for i, t in enumerate(texts):
        a = np.frombuffer(t, np.uint8).astype(np.int64)
        if len(a) < 3:
            continue
        g = (a[:-2] * 65599 + a[1:-1] * 257 + a[2:]) % dim
        np.add.at(counts[i], g, 1.0)
    df = (counts > 0).sum(0)
    idf = np.log((1 + len(texts)) / (1 + df)) + 1.0
    v = counts * idf
    n = np.linalg.norm(v, axis=1, keepdims=True)
    return v / np.maximum(n, 1e-12)


# ----------------------------------------------------------------- eval


def rank_metrics(scores: np.ndarray, k=10):
    """scores: (nq, npassage); GT is the diagonal (query i <- passage i)."""
    order = np.argsort(-scores, axis=1)
    ranks = np.array([int(np.where(order[i] == i)[0][0])
                      for i in range(len(scores))])
    return {
        "recall1": round(float((ranks == 0).mean()), 4),
        f"recall{k}": round(float((ranks < k).mean()), 4),
        "mrr": round(float((1.0 / (ranks + 1)).mean()), 4),
    }


def main():
    import jax

    if os.environ.get("EVAL_CPU", "1") != "0":
        jax.config.update("jax_platforms", "cpu")

    steps = int(os.environ.get("EVAL_STEPS", "400"))
    n_pass = int(os.environ.get("EVAL_PASSAGES", "256"))
    psize = int(os.environ.get("EVAL_PASSAGE_BYTES", "512"))
    qspan = int(os.environ.get("EVAL_QUERY_BYTES", "96"))

    corpus = load_corpus()
    print(f"corpus: {len(corpus)} bytes", file=sys.stderr)
    passages = split_passages(corpus, psize, n_pass)
    queries = make_queries(passages, qspan)
    n = len(passages)

    info, params = train_model(corpus, steps=steps)

    t0 = time.time()
    ph, pv = embed_texts(info, params, passages)
    qh, qv = embed_texts(info, params, queries)
    embed_s = time.time() - t0

    out = {"passages": n, "passage_bytes": psize, "query_bytes": qspan,
           "train_steps": steps, "embed_dim": int(ph.shape[1]),
           "embed_s": round(embed_s, 1)}
    out["hidden_mean_exact"] = rank_metrics(qh @ ph.T)
    out["state_exact"] = rank_metrics(qv @ pv.T)

    # IVF over the mean-hidden embeddings (int8-coded, the 10M path).
    from ai00_server_tpu.ops import retrieval as R
    import jax.numpy as jnp
    nlist = max(4, int(np.sqrt(n)))
    ivf = R.build_ivf(ph.astype(np.float32), nlist=nlist, iters=8,
                      quant="int8")
    _, ids = R.ivf_search(ivf.centroids, ivf.packed, ivf.packed_ids,
                          jnp.asarray(qh, jnp.float32), k=min(10, n),
                          nprobe=max(1, nlist // 4), pscale=ivf.pscale)
    ids = np.asarray(ids)
    hit = np.array([np.where(ids[i] == i)[0] for i in range(n)],
                   dtype=object)
    ranks = np.array([int(h[0]) if len(h) else 10 ** 6 for h in hit])
    out["hidden_mean_ivf_int8"] = {
        "recall1": round(float((ranks == 0).mean()), 4),
        "recall10": round(float((ranks < 10).mean()), 4),
        "nlist": nlist,
    }

    tp = tfidf_vectors(passages)
    tq = tfidf_vectors(queries)
    out["tfidf_3gram"] = rank_metrics(tq @ tp.T)
    out["random"] = {"recall10": round(10 / n, 4)}

    print(json.dumps(out))


if __name__ == "__main__":
    main()
