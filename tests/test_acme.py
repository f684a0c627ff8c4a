"""ACME http-01 client against an in-process mock CA (RFC 8555 subset).

The mock implements directory/newNonce/newAccount/newOrder/challenge/
finalize/certificate, validates the http-01 key-authorization by
fetching the token from the client's challenge server over real HTTP,
and issues a certificate signed by its own self-signed root.  Verifies
the reference listener capability `acme = true` (main.rs:320-423)
without network egress.
"""

import asyncio
import base64
import datetime
import hashlib
import json
import os

import pytest

aiohttp = pytest.importorskip("aiohttp")
from aiohttp import web  # noqa: E402
from aiohttp.test_utils import TestServer  # noqa: E402

from ai00_server_tpu.server.acme import (  # noqa: E402
    AcmeClient, ChallengeStore, challenge_routes,
)


def _b64d(s: str) -> bytes:
    return base64.urlsafe_b64decode(s + "=" * (-len(s) % 4))


class MockCA:
    def __init__(self):
        from cryptography import x509
        from cryptography.hazmat.primitives import hashes
        from cryptography.hazmat.primitives.asymmetric import ec
        from cryptography.x509.oid import NameOID

        self.key = ec.generate_private_key(ec.SECP256R1())
        name = x509.Name([x509.NameAttribute(NameOID.COMMON_NAME,
                                             "mock-acme-root")])
        now = datetime.datetime.now(datetime.timezone.utc)
        self.root = (
            x509.CertificateBuilder()
            .subject_name(name).issuer_name(name)
            .public_key(self.key.public_key())
            .serial_number(x509.random_serial_number())
            .not_valid_before(now)
            .not_valid_after(now + datetime.timedelta(days=365))
            .add_extension(x509.BasicConstraints(ca=True, path_length=None),
                           critical=True)
            .sign(self.key, hashes.SHA256()))
        self.thumbprint = None
        self.challenge_port = None
        self.order_status = "pending"
        self.authz_status = "pending"
        self.cert_pem = None
        self.validated_token = None

    def app(self) -> web.Application:
        app = web.Application()
        base = "{scheme}://{host}"  # filled per-request

        def url(request, path):
            return f"http://{request.host}{path}"

        async def directory(request):
            return web.json_response({
                "newNonce": url(request, "/nonce"),
                "newAccount": url(request, "/new-account"),
                "newOrder": url(request, "/new-order"),
            })

        async def nonce(request):
            return web.Response(headers={"Replay-Nonce": "test-nonce"})

        def parse_jws(body):
            protected = json.loads(_b64d(body["protected"]))
            payload = json.loads(_b64d(body["payload"])) \
                if body["payload"] else None
            return protected, payload

        async def new_account(request):
            protected, _ = parse_jws(await request.json())
            jwk = protected["jwk"]
            canon = json.dumps(jwk, separators=(",", ":"), sort_keys=True)
            self.thumbprint = base64.urlsafe_b64encode(
                hashlib.sha256(canon.encode()).digest()
            ).rstrip(b"=").decode()
            return web.json_response(
                {"status": "valid"}, status=201,
                headers={"Location": url(request, "/account/1"),
                         "Replay-Nonce": "n2"})

        async def new_order(request):
            _, payload = parse_jws(await request.json())
            assert payload["identifiers"][0]["value"] == "example.test"
            return web.json_response({
                "status": "pending",
                "authorizations": [url(request, "/authz/1")],
                "finalize": url(request, "/finalize/1"),
            }, status=201, headers={
                "Location": url(request, "/order/1"),
                "Replay-Nonce": "n3"})

        async def authz(request):
            return web.json_response({
                "status": self.authz_status,
                "challenges": [{
                    "type": "http-01",
                    "url": url(request, "/chall/1"),
                    "token": "tok-123",
                }],
            }, headers={"Replay-Nonce": "n4"})

        async def chall(request):
            # Validate over real HTTP against the client's server.
            async with aiohttp.ClientSession() as s:
                async with s.get(
                        f"http://127.0.0.1:{self.challenge_port}"
                        f"/.well-known/acme-challenge/tok-123") as resp:
                    assert resp.status == 200
                    got = await resp.text()
            assert got == f"tok-123.{self.thumbprint}"
            self.validated_token = got
            self.authz_status = "valid"
            return web.json_response({"status": "valid"},
                                     headers={"Replay-Nonce": "n5"})

        async def finalize(request):
            from cryptography import x509
            from cryptography.hazmat.primitives import hashes, serialization

            _, payload = parse_jws(await request.json())
            csr = x509.load_der_x509_csr(_b64d(payload["csr"]))
            san = csr.extensions.get_extension_for_class(
                x509.SubjectAlternativeName).value
            assert "example.test" in san.get_values_for_type(x509.DNSName)
            now = datetime.datetime.now(datetime.timezone.utc)
            cert = (
                x509.CertificateBuilder()
                .subject_name(csr.subject)
                .issuer_name(self.root.subject)
                .public_key(csr.public_key())
                .serial_number(x509.random_serial_number())
                .not_valid_before(now)
                .not_valid_after(now + datetime.timedelta(days=90))
                .add_extension(san, critical=False)
                .sign(self.key, hashes.SHA256()))
            self.cert_pem = cert.public_bytes(serialization.Encoding.PEM)
            self.order_status = "valid"
            return web.json_response({
                "status": "valid",
                "certificate": url(request, "/cert/1"),
            }, headers={"Replay-Nonce": "n6"})

        async def order(request):
            return web.json_response({
                "status": self.order_status,
                "certificate": url(request, "/cert/1"),
            }, headers={"Replay-Nonce": "n7"})

        async def cert(request):
            return web.Response(body=self.cert_pem,
                                content_type="application/pem-certificate"
                                             "-chain",
                                headers={"Replay-Nonce": "n8"})

        app.router.add_get("/directory", directory)
        app.router.add_route("HEAD", "/nonce", nonce)
        app.router.add_post("/new-account", new_account)
        app.router.add_post("/new-order", new_order)
        app.router.add_post("/authz/1", authz)
        app.router.add_post("/chall/1", chall)
        app.router.add_post("/finalize/1", finalize)
        app.router.add_post("/order/1", order)
        app.router.add_post("/cert/1", cert)
        return app


def test_acme_http01_issues_certificate(tmp_path):
    async def main():
        ca = MockCA()
        ca_server = TestServer(ca.app())
        await ca_server.start_server()

        store = ChallengeStore()
        chal_app = web.Application()
        chal_app.add_routes(challenge_routes(store))
        chal_server = TestServer(chal_app)
        await chal_server.start_server()
        ca.challenge_port = chal_server.port

        client = AcmeClient(
            "example.test", str(tmp_path),
            directory_url=f"http://127.0.0.1:{ca_server.port}/directory",
            challenges=store)
        cert_path, key_path = await client.ensure_certificate(
            poll_delay=0.01)

        # The issued certificate verifies against the mock root and
        # covers the domain; the key matches.
        from cryptography import x509
        from cryptography.hazmat.primitives import serialization

        with open(cert_path, "rb") as f:
            cert = x509.load_pem_x509_certificate(f.read())
        san = cert.extensions.get_extension_for_class(
            x509.SubjectAlternativeName).value
        assert "example.test" in san.get_values_for_type(x509.DNSName)
        cert.verify_directly_issued_by(ca.root)
        with open(key_path, "rb") as f:
            key = serialization.load_pem_private_key(f.read(), None)
        assert key.public_key().public_numbers() == \
            cert.public_key().public_numbers()
        # Token unpublished after the order completes.
        assert store.get("tok-123") is None
        assert ca.validated_token is not None

        # Second call reuses the fresh certificate without the CA.
        await ca_server.close()
        c2, k2 = await client.ensure_certificate()
        assert (c2, k2) == (cert_path, key_path)
        assert client.current_cert_ok()

        await chal_server.close()

    asyncio.run(main())


def test_renew_loop_hot_swaps_near_expiry_cert(tmp_path):
    """main._acme_renew_loop re-orders when the stored certificate has
    fewer than RENEW_DAYS left and hot-swaps the chain into the live SSL
    context (reference: rustls-acme renews automatically,
    main.rs:320-423)."""
    import ssl

    from cryptography import x509
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import ec
    from cryptography.x509.oid import NameOID

    from ai00_server_tpu.main import _acme_renew_loop

    async def main():
        ca = MockCA()
        ca_server = TestServer(ca.app())
        await ca_server.start_server()

        store = ChallengeStore()
        chal_app = web.Application()
        chal_app.add_routes(challenge_routes(store))
        chal_server = TestServer(chal_app)
        await chal_server.start_server()
        ca.challenge_port = chal_server.port

        client = AcmeClient(
            "example.test", str(tmp_path),
            directory_url=f"http://127.0.0.1:{ca_server.port}/directory",
            challenges=store)

        # Seed a nearly-expired self-signed cert + key at the client's
        # paths: current_cert_ok() is False (< RENEW_DAYS remain).
        key = ec.generate_private_key(ec.SECP256R1())
        name = x509.Name([x509.NameAttribute(NameOID.COMMON_NAME,
                                             "example.test")])
        now = datetime.datetime.now(datetime.timezone.utc)
        old = (x509.CertificateBuilder()
               .subject_name(name).issuer_name(name)
               .public_key(key.public_key())
               .serial_number(x509.random_serial_number())
               .not_valid_before(now - datetime.timedelta(days=80))
               .not_valid_after(now + datetime.timedelta(days=2))
               .sign(key, hashes.SHA256()))
        with open(client.cert_path, "wb") as f:
            f.write(old.public_bytes(serialization.Encoding.PEM))
        with open(client.key_path, "wb") as f:
            f.write(key.private_bytes(
                serialization.Encoding.PEM,
                serialization.PrivateFormat.PKCS8,
                serialization.NoEncryption()))
        assert not client.current_cert_ok()

        ssl_ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
        ssl_ctx.load_cert_chain(client.cert_path, client.key_path)

        task = asyncio.ensure_future(_acme_renew_loop(
            client, store, "127.0.0.1", ssl_ctx, interval=0.02,
            http_port=0))
        try:
            for _ in range(400):
                await asyncio.sleep(0.02)
                if client.current_cert_ok():
                    break
            assert client.current_cert_ok(), "renewal never completed"
        finally:
            task.cancel()
            try:
                await task
            except asyncio.CancelledError:
                pass

        # The renewed certificate is CA-issued, not the seeded one.
        with open(client.cert_path, "rb") as f:
            cert = x509.load_pem_x509_certificate(f.read())
        cert.verify_directly_issued_by(ca.root)

        await ca_server.close()
        await chal_server.close()

    asyncio.run(main())


def test_current_cert_ok_false_without_files(tmp_path):
    client = AcmeClient("example.test", str(tmp_path),
                        directory_url="http://127.0.0.1:1/directory")
    assert not client.current_cert_ok()
