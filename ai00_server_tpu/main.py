"""Server entry point (reference: crates/ai00-server/src/main.rs).

Usage: ``python -m ai00_server_tpu.main --config assets/configs/Config.toml
[--ip 0.0.0.0] [--port 65530]``
"""

from __future__ import annotations

import argparse
import asyncio
import logging
import os
import ssl
import sys

from aiohttp import web

log = logging.getLogger("ai00_server_tpu")


def parse_args(argv=None):
    p = argparse.ArgumentParser("ai00_server_tpu")
    p.add_argument("--config", "-c", default="assets/configs/Config.toml")
    p.add_argument("--ip", default=None)
    p.add_argument("--port", "-p", type=int, default=None)
    return p.parse_args(argv)


def _enable_compile_cache():
    """Persistent XLA compile cache: restarts pay tracing only, not XLA
    compilation (crucial with a remote-compile TPU tunnel)."""
    import jax

    try:
        cache = os.environ.get(
            "AI00_COMPILE_CACHE",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), ".jax_cache"))
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        log.exception("compile cache setup failed")


async def amain(argv=None):
    args = parse_args(argv)
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)s %(name)s %(message)s")
    _enable_compile_cache()

    from .server.app import Server
    from .server.config import Config
    from .server import files as files_mod

    if os.path.exists(args.config):
        config = Config.from_toml(args.config)
    else:
        log.warning("config %s not found; using defaults", args.config)
        config = Config()

    server = Server(config)

    # Initial model autoload (main.rs:189-198), in the background so the
    # HTTP endpoints come up immediately.
    if config.model.get("name"):
        async def autoload():
            try:
                await server.middleware.reload(config.to_reload_request())
                log.info("model loaded: %s",
                         server.middleware.env.reload.model_path)
            except Exception:
                log.exception("initial model load failed")
        asyncio.get_event_loop().create_task(autoload())

    # External embedding sidecar ([embed], config.rs:82-157): the native
    # build serves /api/oai/embeddings from RWKV states by default; an
    # optional local transformer model can replace it (server/embed.py).
    if config.embed:
        try:
            from .server import embed as embed_mod

            server.embedder = await embed_mod.load_embedder(config.embed)
            if server.embedder is not None:
                log.info("external embedding model loaded: %s",
                         config.embed.get("path") or config.embed.get("name"))
        except Exception:
            log.exception(
                "[embed] configured but the sidecar failed to load; "
                "falling back to native model-derived embeddings")

    # WebUI static files (main.rs:200-243): extract the zip, then extract
    # every plugins/*.zip (except 'api') into <web>/plugins/<name>.
    if config.web and config.web.get("path"):
        zip_path = config.web["path"]
        target = os.path.join(os.path.dirname(zip_path), "_webui")
        if os.path.exists(zip_path) and os.path.getsize(zip_path) > 1024:
            try:
                files_mod.unzip(zip_path, target)
                load_plugins(os.path.join(os.path.dirname(zip_path),
                                          "plugins"), target)
                server.app.router.add_static("/", target, show_index=True)
            except Exception:
                log.exception("webui extraction failed")

    ip = args.ip or config.listen.ip
    port = args.port or config.listen.port

    # Reference listener semantics (main.rs:325-332): a non-"local" domain
    # forces TLS; acme requests automatic certificates.  The native ACME
    # http-01 client (server/acme.py) provisions them; failures fall back
    # to the configured certificate files.  (QUIC/HTTP3 remains
    # unsupported — TCP+TLS only.)
    acme = config.listen.acme and config.listen.domain != "local"
    tls = config.listen.tls or config.listen.domain != "local"
    if config.listen.quic:
        log.warning(
            "listen.quic=true requested, but HTTP/3 (QUIC) is NOT "
            "implemented in this build — serving HTTP/1.1 over TCP%s "
            "only.  (The reference serves H3 via quinn, main.rs:343-358; "
            "H3-capable clients fall back to TCP automatically.  See "
            "docs/http3.md.)", "+TLS" if tls else "")
    elif tls:
        log.info(
            "TLS listener serves HTTP/1.1 over TCP only (no HTTP/3/QUIC "
            "— docs/http3.md); reference-parity H3 clients fall back to "
            "TCP")
    cert_file, key_file = config.listen.tls_cert, config.listen.tls_key
    if acme:
        from .server import acme as acme_mod

        store = acme_mod.ChallengeStore()
        routes = acme_mod.challenge_routes(store)
        server.app.add_routes(routes)  # in case :80 routes to the app
        client = acme_mod.AcmeClient(
            config.listen.domain,
            cert_dir=os.path.dirname(cert_file) or "assets/certs",
            directory_url=config.listen.acme_directory or acme_mod.LETSENCRYPT,
            challenges=store,
            contact=config.listen.acme_contact or None)
        try:
            cert_file, key_file = await _acme_obtain(
                acme_mod, client, store, ip)
        except Exception:
            log.exception(
                "acme: certificate provisioning failed; falling back to "
                "the configured files %s / %s", cert_file, key_file)

    ssl_ctx = None
    if tls:
        ssl_ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
        ssl_ctx.load_cert_chain(cert_file, key_file)
        if acme:
            # Renewal loop: re-order when < RENEW_DAYS remain and swap
            # the chain into the LIVE SSLContext (load_cert_chain on an
            # existing context applies to subsequent handshakes), so a
            # long-running server never serves an expired certificate.
            # Reference behavior: rustls-acme renews automatically
            # (main.rs:320-423).
            asyncio.ensure_future(_acme_renew_loop(
                client, store, ip, ssl_ctx))

    runner = web.AppRunner(server.app)
    await runner.setup()
    # Dual-stack binding (main.rs:321-423): an IPv6 listen address also
    # binds the IPv4 wildcard; an unspecified IPv6 address covers both on
    # Linux via a single socket.
    binds = [ip]
    try:
        import ipaddress

        addr = ipaddress.ip_address(ip)
        if addr.version == 6 and not addr.is_unspecified:
            binds.append("0.0.0.0")
    except ValueError:
        pass  # hostname: let the resolver handle it
    for host in binds:
        await web.TCPSite(runner, host, port, ssl_context=ssl_ctx).start()
    scheme = "https" if ssl_ctx else "http"
    log.info("serving on %s://%s:%d (docs at /api-docs)", scheme, ip, port)
    while True:
        await asyncio.sleep(3600)


async def _acme_obtain(acme_mod, client, store, ip, http_port: int = 80):
    """Run one certificate order with a transient plain-HTTP :80
    responder for the CA's http-01 validation fetch."""
    from aiohttp import web

    http80 = web.Application()
    http80.add_routes(acme_mod.challenge_routes(store))
    runner80 = web.AppRunner(http80)
    await runner80.setup()
    try:
        try:
            await web.TCPSite(runner80, ip, http_port).start()
        except OSError as e:
            log.warning("acme: cannot bind :%d for http-01 (%s); relying "
                        "on an external route to /.well-known/"
                        "acme-challenge/", http_port, e)
        return await client.ensure_certificate()
    finally:
        await runner80.cleanup()


async def _acme_renew_loop(client, store, ip, ssl_ctx,
                           interval: float = 12 * 3600,
                           http_port: int = 80) -> None:
    """Re-check certificate validity every ``interval`` seconds; when
    fewer than acme.RENEW_DAYS remain, re-order and hot-swap the chain
    into the live SSL context (new handshakes pick it up; no restart)."""
    from .server import acme as acme_mod

    while True:
        await asyncio.sleep(interval)
        try:
            if client.current_cert_ok():
                continue
            cert_file, key_file = await _acme_obtain(
                acme_mod, client, store, ip, http_port)
            ssl_ctx.load_cert_chain(cert_file, key_file)
            log.info("acme: certificate renewed for %s", client.domain)
        except asyncio.CancelledError:
            raise
        except Exception:
            log.exception("acme: renewal failed; retrying in %.0fs",
                          interval)


def load_plugins(plugins_dir: str, target: str) -> None:
    """Extract WebUI plugin zips (main.rs:200-243, load_plugin:72-90):
    every ``<plugins_dir>/*.zip`` except ``api.zip`` lands in
    ``<target>/plugins/<stem>/``."""
    from .server import files as files_mod

    if not os.path.isdir(plugins_dir):
        return
    for entry in sorted(os.listdir(plugins_dir)):
        if not entry.endswith(".zip"):
            continue
        stem = entry[:-4]
        if stem == "api":
            continue
        src = os.path.join(plugins_dir, entry)
        dst = os.path.join(target, "plugins", stem)
        try:
            os.makedirs(dst, exist_ok=True)
            files_mod.unzip(src, dst)
            log.info("loaded plugin %s", stem)
        except Exception:
            log.exception("failed to load plugin %s", stem)


def main(argv=None):
    try:
        asyncio.run(amain(argv))
    except KeyboardInterrupt:
        pass


if __name__ == "__main__":
    main(sys.argv[1:])
