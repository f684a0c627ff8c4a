"""HTTP serving tier: aiohttp app, auth, config, file management.

Reference: crates/ai00-server (C6-C13 in SURVEY.md §2) — route table at
crates/ai00-server/src/main.rs:245-320, re-provided natively on asyncio.
"""
