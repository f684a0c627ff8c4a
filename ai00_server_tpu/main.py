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


async def amain(argv=None):
    args = parse_args(argv)
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)s %(name)s %(message)s")

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

    # WebUI static files (main.rs:200-243): serve an extracted zip.
    if config.web and config.web.get("path"):
        zip_path = config.web["path"]
        target = os.path.join(os.path.dirname(zip_path), "_webui")
        if os.path.exists(zip_path) and os.path.getsize(zip_path) > 1024:
            try:
                files_mod.unzip(zip_path, target)
                server.app.router.add_static("/", target, show_index=True)
            except Exception:
                log.exception("webui extraction failed")

    ip = args.ip or config.listen.ip
    port = args.port or config.listen.port

    ssl_ctx = None
    if config.listen.tls:
        ssl_ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
        ssl_ctx.load_cert_chain(config.listen.tls_cert, config.listen.tls_key)

    runner = web.AppRunner(server.app)
    await runner.setup()
    site = web.TCPSite(runner, ip, port, ssl_context=ssl_ctx)
    await site.start()
    scheme = "https" if ssl_ctx else "http"
    log.info("serving on %s://%s:%d (docs at /api-docs)", scheme, ip, port)
    while True:
        await asyncio.sleep(3600)


def main(argv=None):
    try:
        asyncio.run(amain(argv))
    except KeyboardInterrupt:
        pass


if __name__ == "__main__":
    main(sys.argv[1:])
