"""Interned name table + stable content hashes.

TPU-native equivalent of the reference's string table / FName system
(reference: source/utils/string_table.h:11 `StringTable` — global
deduplicated string storage; :162 `FName` — an index into it with O(1)
equality, used for asset/component identity) and its cityhash/crc32
helpers (source/utils/cityhash/, utils/crc.h). Python interns short
strings already, but the *contract* the engine needs is the reference's:
a process-global id per unique name (stable within a run, usable as an
int key in arrays/dicts), case-preserving first-registration like
Unreal's FName, and a stable 64-bit content hash that does NOT change
across processes (unlike Python's randomized `hash`), for container
keys that persist to disk.
"""

from __future__ import annotations

import threading
import zlib
from typing import Dict, List, Optional


class StringTable:
    """Global deduplicating string registry: name -> dense int id."""

    def __init__(self) -> None:
        self._ids: Dict[str, int] = {}
        self._strings: List[str] = []
        self._lock = threading.Lock()

    def intern(self, s: str) -> int:
        sid = self._ids.get(s)
        if sid is not None:
            return sid
        with self._lock:
            sid = self._ids.get(s)
            if sid is None:
                sid = len(self._strings)
                self._strings.append(s)
                self._ids[s] = sid
            return sid

    def lookup(self, sid: int) -> str:
        return self._strings[sid]

    def __len__(self) -> int:
        return len(self._strings)


_GLOBAL_TABLE = StringTable()


class Name:
    """Interned name: O(1) equality/hash via the table id (the FName
    contract, string_table.h:162). Comparison is case-insensitive; the
    first registration's casing is preserved for display (Unreal FName
    semantics, which the reference mirrors)."""

    __slots__ = ("_id", "_display")

    def __init__(self, s: "str | Name" = "") -> None:
        if isinstance(s, Name):
            self._id = s._id
            self._display = s._display
            return
        key = s.lower()
        self._id = _GLOBAL_TABLE.intern(key)
        # preserve first-seen casing for display
        self._display = _DISPLAY.setdefault(self._id, s)

    @property
    def id(self) -> int:
        return self._id

    def __eq__(self, other) -> bool:
        if isinstance(other, Name):
            return self._id == other._id
        if isinstance(other, str):
            return self._id == _GLOBAL_TABLE.intern(other.lower())
        return NotImplemented

    def __hash__(self) -> int:
        return self._id

    def __str__(self) -> str:
        return self._display

    def __repr__(self) -> str:
        return f"Name({self._display!r}#{self._id})"

    def __bool__(self) -> bool:
        return bool(self._display)


_DISPLAY: Dict[int, str] = {}


# ---------------------------------------------------------------------------
# Stable content hashes (reference: cityhash64 + crc32 used for cvar name
# maps and shader-blob cache keys). Stability across processes matters —
# these feed disk cache keys; Python's builtin hash() is salted per run.

_FNV64_OFFSET = 0xCBF29CE484222325
_FNV64_PRIME = 0x100000001B3


def stable_hash64(data: "bytes | str", seed: int = 0) -> int:
    """FNV-1a 64-bit (public domain construction) with optional seed."""
    if isinstance(data, str):
        data = data.encode()
    h = _FNV64_OFFSET ^ seed
    for b in data:
        h = ((h ^ b) * _FNV64_PRIME) & 0xFFFFFFFFFFFFFFFF
    return h


def crc32(data: "bytes | str") -> int:
    if isinstance(data, str):
        data = data.encode()
    return zlib.crc32(data) & 0xFFFFFFFF


def combine_hash(*parts: int) -> int:
    """Order-dependent 64-bit hash combiner (boost hash_combine shape)."""
    h = _FNV64_OFFSET
    for p in parts:
        h ^= (p + 0x9E3779B97F4A7C15 + ((h << 6) & 0xFFFFFFFFFFFFFFFF) +
              (h >> 2)) & 0xFFFFFFFFFFFFFFFF
        h &= 0xFFFFFFFFFFFFFFFF
    return h


def intern(s: str) -> int:
    """Shorthand: global table id for a raw (case-sensitive) string."""
    return _GLOBAL_TABLE.intern(s)


def lookup(sid: int) -> str:
    return _GLOBAL_TABLE.lookup(sid)
