"""Shared corrupt-input contract backstop for the codec modules.

Every in-repo decoder documents one failure contract: malformed input
raises ``ValueError('corrupt <fmt>: ...')`` (or ``NotImplementedError``
for scoped-out features). The specific validation checks inside each
codec remain the primary, descriptive errors; this decorator is the
totality backstop — any parser exception that slips past them
(struct/zlib errors, index/key/type errors from attacker-controlled
offsets) is converted instead of leaking a foreign exception type to a
Ray worker. Pinned by the decoder fuzz in tests/test_codec_property.py.
"""
from __future__ import annotations

import functools
import struct
import zlib


def corrupt_guard(fmt: str):
    def deco(fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            try:
                return fn(*args, **kwargs)
            except (ValueError, NotImplementedError):
                raise
            except (struct.error, zlib.error, IndexError, KeyError,
                    TypeError, OverflowError) as exc:
                raise ValueError(
                    f"corrupt {fmt}: {type(exc).__name__}: {exc}") from exc
        return wrapper
    return deco
