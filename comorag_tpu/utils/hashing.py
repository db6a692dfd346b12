"""Content-addressed identifiers.

Same scheme as the reference (misc_utils.py:152-163): MD5 hex digest of the
text, namespaced by a prefix, so indexes are resumable and dedup-on-insert is
a set lookup.
"""

from __future__ import annotations

import functools
import hashlib


@functools.lru_cache(maxsize=1 << 20)
def content_hash(content: str, prefix: str = "") -> str:
    """Return ``prefix + md5(content)`` for content-addressed storage.

    Memoized: graph construction and pool dedup hash the same entity
    strings millions of times at 50k+ chunk scale."""
    return prefix + hashlib.md5(content.encode()).hexdigest()
