""".env-based configuration (reference ``config/dotenv.py:5-32``).

Parses a ``.env`` file into ``os.environ`` on first access and exposes the
reference's static accessors (AUDIO_PATH, IMPULSE_RESPONSE_PATH, S3_BUCKET,
PORT) plus a cache path for KV stores / demo data.
"""

from __future__ import annotations

import os

_parsed = False


def parse_dotenv(path: str = ".env") -> None:
    global _parsed
    if _parsed:
        return
    _parsed = True
    if not os.path.exists(path):
        return
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#") or "=" not in line:
                continue
            key, _, value = line.partition("=")
            os.environ.setdefault(key.strip(), value.strip())


class Config:
    @staticmethod
    def audio_path():
        parse_dotenv()
        return os.environ.get("AUDIO_PATH")

    @staticmethod
    def impulse_response_path():
        parse_dotenv()
        return os.environ.get("IMPULSE_RESPONSE_PATH")

    @staticmethod
    def s3_bucket():
        parse_dotenv()
        return os.environ.get("S3_BUCKET")

    @staticmethod
    def port(default: int = 9999) -> int:
        parse_dotenv()
        return int(os.environ.get("PORT", default))

    @staticmethod
    def cache_path() -> str:
        parse_dotenv()
        path = os.environ.get(
            "MPTPU_CACHE", os.path.join(os.path.expanduser("~"), ".mptpu_cache")
        )
        os.makedirs(path, exist_ok=True)
        return path
