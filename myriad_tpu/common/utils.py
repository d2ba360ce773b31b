"""Misc utilities (reference minigpt4/common/utils.py:35-433 subset that the
live pipelines use: job ids, url detection, cache paths)."""

from __future__ import annotations

import hashlib
import os
import re
from datetime import datetime
from urllib.parse import urlparse

from myriad_tpu.common.registry import registry


def now() -> str:
    """Job-id timestamp (reference utils: now())."""
    return datetime.now().strftime("%Y%m%d%H%M%S")


def is_url(url_or_filename: str) -> bool:
    parsed = urlparse(str(url_or_filename))
    return parsed.scheme in ("http", "https")


def get_cache_path(rel_path: str) -> str:
    return os.path.expanduser(os.path.join(registry.get_path("cache_root"), rel_path))


def get_abs_path(rel_path: str) -> str:
    return os.path.join(registry.get_path("library_root"), rel_path)


def download_cached_file(url: str, check_hash: bool = False, progress: bool = True) -> str:
    """Download once into the cache dir (rank-0 gating is the caller's job;
    zero-egress environments should pre-stage files at the cache path)."""
    name = os.path.basename(urlparse(url).path) or hashlib.sha1(url.encode()).hexdigest()
    cached = get_cache_path(name)
    if os.path.isfile(cached):
        return cached
    os.makedirs(os.path.dirname(cached), exist_ok=True)
    import urllib.request

    urllib.request.urlretrieve(url, cached)  # noqa: S310 - explicit user action
    return cached


def cleanup_text(text: str) -> str:
    """Collapse whitespace (shared by caption paths)."""
    return re.sub(r"\s{2,}", " ", text).strip()
