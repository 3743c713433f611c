"""Security utilities: rate limiting, sanitization, PHI detection, secure
storage, session tokens.

Parity surface: reference ``dgdm_histopath/utils/security.py`` —
``RateLimiter`` (:63), ``InputSanitizer`` (:304), ``DataEncryption`` (:186;
Fernet there — XOR-free AES is unavailable without the cryptography package
in all environments, so encryption gates on its presence), ``SecureStorage``
(:391), ``PHIDetector`` (:556), session tokens / password hashing (:745-820).
"""

from __future__ import annotations

import hashlib
import hmac
import json
import os
import re
import secrets
import threading
import time
from pathlib import Path
from typing import Dict, List, Optional, Tuple

from .exceptions import SecurityError
from .logging import get_logger

logger = get_logger("security")


class RateLimiter:
    """Token-bucket rate limiter keyed by caller id (reference :63)."""

    def __init__(self, rate: float = 10.0, burst: int = 20):
        self.rate = rate
        self.burst = burst
        self._buckets: Dict[str, Tuple[float, float]] = {}
        self._lock = threading.Lock()

    def allow(self, key: str = "default") -> bool:
        now = time.monotonic()
        with self._lock:
            tokens, last = self._buckets.get(key, (float(self.burst), now))
            tokens = min(self.burst, tokens + (now - last) * self.rate)
            if tokens >= 1.0:
                self._buckets[key] = (tokens - 1.0, now)
                return True
            self._buckets[key] = (tokens, now)
            return False

    def check(self, key: str = "default") -> None:
        if not self.allow(key):
            raise SecurityError("rate limit exceeded", {"key": key})


class InputSanitizer:
    """String sanitization against injection patterns (reference :304)."""

    _SQL_PAT = re.compile(r"(;|--|\b(drop|delete|insert|update|union|exec)\b)",
                          re.IGNORECASE)
    _PATH_PAT = re.compile(r"\.\.[/\\]")
    _SHELL_PAT = re.compile(r"[;&|`$<>]")
    _HTML_PAT = re.compile(r"<[^>]*>")

    @classmethod
    def sanitize_string(cls, value: str, max_length: int = 1024) -> str:
        if len(value) > max_length:
            raise SecurityError("input exceeds max length", {"len": len(value)})
        return cls._HTML_PAT.sub("", value)

    @classmethod
    def check_sql_injection(cls, value: str) -> None:
        if cls._SQL_PAT.search(value):
            raise SecurityError("possible SQL injection", {"value": value[:64]})

    @classmethod
    def check_path_traversal(cls, value: str) -> None:
        if cls._PATH_PAT.search(value):
            raise SecurityError("path traversal attempt", {"value": value[:64]})

    @classmethod
    def check_shell_injection(cls, value: str) -> None:
        if cls._SHELL_PAT.search(value):
            raise SecurityError("possible shell injection", {"value": value[:64]})

    @classmethod
    def sanitize_filename(cls, name: str) -> str:
        cleaned = re.sub(r"[^A-Za-z0-9._\-]", "_", name)
        if not cleaned or cleaned.startswith("."):
            raise SecurityError("invalid filename", {"name": name})
        return cleaned[:255]

    @classmethod
    def sanitize_identifier(cls, name: str) -> str:
        """Usernames / job names: alnum plus ``-_.``, must start alnum."""
        cleaned = re.sub(r"[^A-Za-z0-9._\-]", "_", str(name))
        if not cleaned or not cleaned[0].isalnum():
            raise SecurityError("invalid identifier", {"name": str(name)[:64]})
        return cleaned[:64]


class PHIDetector:
    """Heuristic protected-health-information detector (reference :556)."""

    PATTERNS = {
        "ssn": re.compile(r"\b\d{3}-\d{2}-\d{4}\b"),
        "mrn": re.compile(r"\b(mrn|medical record)[:#\s]*\d{6,10}\b", re.IGNORECASE),
        "phone": re.compile(r"\b(\+?1[-.\s]?)?\(?\d{3}\)?[-.\s]\d{3}[-.\s]\d{4}\b"),
        "email": re.compile(r"\b[\w.+-]+@[\w-]+\.[\w.]+\b"),
        "date_of_birth": re.compile(r"\b(dob|date of birth)[:\s]*\d{1,2}[/-]\d{1,2}[/-]\d{2,4}\b",
                                    re.IGNORECASE),
    }

    @classmethod
    def scan(cls, text: str) -> List[Dict[str, str]]:
        findings = []
        for kind, pat in cls.PATTERNS.items():
            for m in pat.finditer(text):
                findings.append({"type": kind, "match": m.group(0)[:32],
                                 "position": m.start()})
        return findings

    @classmethod
    def redact(cls, text: str) -> str:
        for pat in cls.PATTERNS.values():
            text = pat.sub("[REDACTED]", text)
        return text

    @classmethod
    def contains_phi(cls, text: str) -> bool:
        return bool(cls.scan(text))


def hash_password(password: str, salt: Optional[bytes] = None,
                  iterations: int = 200_000) -> str:
    """PBKDF2-HMAC-SHA256 password hash (reference :745-790)."""
    salt = salt or secrets.token_bytes(16)
    dk = hashlib.pbkdf2_hmac("sha256", password.encode(), salt, iterations)
    return f"pbkdf2${iterations}${salt.hex()}${dk.hex()}"


def verify_password(password: str, stored: str) -> bool:
    try:
        _, iters, salt_hex, dk_hex = stored.split("$")
        dk = hashlib.pbkdf2_hmac("sha256", password.encode(),
                                 bytes.fromhex(salt_hex), int(iters))
        return hmac.compare_digest(dk.hex(), dk_hex)
    except (ValueError, TypeError):
        return False


class SessionTokenManager:
    """HMAC-signed expiring session tokens (reference :792-820)."""

    def __init__(self, secret: Optional[bytes] = None, ttl_s: float = 3600.0):
        self._secret = secret or secrets.token_bytes(32)
        self.ttl_s = ttl_s

    def issue(self, subject: str) -> str:
        payload = f"{subject}|{time.time() + self.ttl_s:.0f}|{secrets.token_hex(8)}"
        sig = hmac.new(self._secret, payload.encode(), hashlib.sha256).hexdigest()
        return f"{payload}|{sig}"

    def verify(self, token: str) -> str:
        try:
            payload, sig = token.rsplit("|", 1)
            expect = hmac.new(self._secret, payload.encode(), hashlib.sha256).hexdigest()
            if not hmac.compare_digest(sig, expect):
                raise SecurityError("invalid token signature")
            subject, expiry, _ = payload.split("|")
            if time.time() > float(expiry):
                raise SecurityError("token expired")
            return subject
        except (ValueError, IndexError) as exc:
            raise SecurityError("malformed token") from exc


class DataEncryption:
    """Symmetric encryption via the ``cryptography`` package when present;
    raises clearly otherwise (reference used Fernet, :186)."""

    def __init__(self, key: Optional[bytes] = None):
        try:
            from cryptography.fernet import Fernet
        except ImportError as exc:  # pragma: no cover
            raise SecurityError("cryptography package not installed") from exc
        self._fernet = Fernet(key or Fernet.generate_key())

    def encrypt(self, data: bytes) -> bytes:
        return self._fernet.encrypt(data)

    def decrypt(self, data: bytes) -> bytes:
        return self._fernet.decrypt(data)


class SecureStorage:
    """Integrity-protected JSON store: HMAC over content (reference :391)."""

    def __init__(self, directory: str | Path, secret: Optional[bytes] = None):
        self.directory = Path(directory)
        self.directory.mkdir(parents=True, exist_ok=True)
        self._secret = secret or secrets.token_bytes(32)

    def _path(self, key: str) -> Path:
        return self.directory / f"{InputSanitizer.sanitize_filename(key)}.json"

    def put(self, key: str, value: dict) -> None:
        blob = json.dumps(value, sort_keys=True)
        sig = hmac.new(self._secret, blob.encode(), hashlib.sha256).hexdigest()
        self._path(key).write_text(json.dumps({"data": blob, "sig": sig}))

    def get(self, key: str) -> dict:
        raw = json.loads(self._path(key).read_text())
        expect = hmac.new(self._secret, raw["data"].encode(), hashlib.sha256).hexdigest()
        if not hmac.compare_digest(raw["sig"], expect):
            raise SecurityError("storage integrity check failed", {"key": key})
        return json.loads(raw["data"])


class SecurityAuditor:
    """Rolling audit log of security events (reference :108)."""

    def __init__(self, max_events: int = 10_000):
        self.events: List[dict] = []
        self.max_events = max_events
        self._lock = threading.Lock()

    def record(self, kind: str, detail: str = "", severity: str = "info") -> None:
        with self._lock:
            self.events.append({"ts": time.time(), "kind": kind,
                                "detail": PHIDetector.redact(detail)[:256],
                                "severity": severity})
            if len(self.events) > self.max_events:
                self.events = self.events[-self.max_events:]

    def summary(self) -> Dict[str, int]:
        from collections import Counter
        with self._lock:
            return dict(Counter(e["kind"] for e in self.events))


GLOBAL_AUDITOR = SecurityAuditor()
