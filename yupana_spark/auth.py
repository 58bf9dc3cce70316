"""User management + role-based permissions (SURVEY.md §2.11).

Re-expresses the reference's auth layer — users with roles, a permission
matrix per role, and credential validation — against the warehouse
instead of an HBase/JDBC UserDao:

* ``yupana-core/.../auth/YupanaUser.scala`` — (name, password, role);
  ``ANONYMOUS`` is READ_ONLY.
* ``auth/TsdbRole.scala:17-52`` — the four roles and their permission
  sets: DISABLED (nothing), READ_ONLY (table+meta read, query read),
  READ_WRITE (adds table write), ADMIN (everything, incl. user
  management).
* ``auth/Permission.scala`` / ``auth/PermissionService.scala`` — the
  (subject, action) implication check, with table WRITES additionally
  gated on ``put_enabled``.
* ``auth/UserManager.scala:26-69`` — create/update/delete/find/list/
  validate with the reference's exact error strings ("User already
  exists", "User not found", "Invalid role name '<r>'"), plus the
  config-superuser short-circuit in ``validate_user``.

Deviations, both deliberate and documented: passwords hash with
PBKDF2-HMAC-SHA256 (hashlib, 216k iterations) instead of bcrypt —
bcrypt is a JVM library choice, not an observable semantic; and the
registry persists as one small JSON file under the warehouse root
(atomic tmp+rename, the artifact-store posture) instead of a UserDao
table — a user registry is metadata measured in rows, not data, and a
distributed scan would be the wrong tool at any scale.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
import secrets
import tempfile
import threading
from typing import Dict, List, Optional

#: role name -> permission matrix: for each subject kind, the set of
#: allowed actions (TsdbRole.scala:17-52).  Table writes are ALSO gated
#: on PermissionService.put_enabled, like the reference.
_ROLE_PERMS: Dict[str, Dict[str, frozenset]] = {
    "DISABLED": {"table": frozenset(), "user": frozenset(),
                 "metadata": frozenset(), "queries": frozenset()},
    "READ_ONLY": {"table": frozenset({"read"}), "user": frozenset(),
                  "metadata": frozenset({"read", "write"}),
                  "queries": frozenset({"read"})},
    "READ_WRITE": {"table": frozenset({"read", "write"}),
                   "user": frozenset(),
                   "metadata": frozenset({"read", "write"}),
                   "queries": frozenset({"read"})},
    "ADMIN": {"table": frozenset({"read", "write"}),
              "user": frozenset({"read", "write"}),
              "metadata": frozenset({"read", "write"}),
              "queries": frozenset({"read", "write"})},
}

ROLES = tuple(_ROLE_PERMS)


def role_by_name(name: str) -> Optional[str]:
    """Case-insensitive role lookup (TsdbRole.roleByName)."""
    r = name.upper()
    return r if r in _ROLE_PERMS else None


@dataclasses.dataclass(frozen=True)
class YupanaUser:
    """≙ auth/YupanaUser.scala — the effective identity of a statement."""

    name: str
    password_hash: Optional[str] = None
    role: str = "READ_ONLY"


#: ≙ YupanaUser.ANONYMOUS (read-only when authentication is enforced)
ANONYMOUS = YupanaUser("ANONYMOUS", None, "READ_ONLY")

_PBKDF2_ITERS = 216_000


def hash_password(password: str) -> str:
    """PBKDF2-HMAC-SHA256 with a random salt, self-describing format
    (``pbkdf2$<iters>$<salt_hex>$<digest_hex>``) so the cost can be
    raised later without invalidating stored hashes."""
    salt = secrets.token_bytes(16)
    dig = hashlib.pbkdf2_hmac("sha256", password.encode(), salt,
                              _PBKDF2_ITERS)
    return f"pbkdf2${_PBKDF2_ITERS}${salt.hex()}${dig.hex()}"


def verify_password(password: str, stored: str) -> bool:
    try:
        scheme, iters, salt_hex, dig_hex = stored.split("$")
        if scheme != "pbkdf2":
            return False
        dig = hashlib.pbkdf2_hmac("sha256", password.encode(),
                                  bytes.fromhex(salt_hex), int(iters))
        return secrets.compare_digest(dig.hex(), dig_hex)
    except (ValueError, AttributeError):
        return False


class AuthError(Exception):
    """Typed auth failure — the Left(...) strings of the reference."""


class PermissionService:
    """≙ auth/PermissionService.scala: role matrix + the put_enabled
    correction on table writes."""

    def __init__(self, put_enabled: bool = True):
        self.put_enabled = put_enabled

    def has_permission(self, user: YupanaUser, subject: str,
                       action: str) -> bool:
        if subject == "table" and action == "write" and not self.put_enabled:
            return False
        perms = _ROLE_PERMS.get(user.role)
        return perms is not None and action in perms.get(subject, ())

    def check(self, user: YupanaUser, subject: str, action: str) -> None:
        """Raise the reference's permission-denied message
        (QueryEngineRouter.scala:166-170) unless allowed."""
        if not self.has_permission(user, subject, action):
            raise AuthError(
                f"User {user.name} doesn't have enough permissions")


class UserManager:
    """≙ auth/UserManager.scala over a warehouse-root JSON registry.

    The store is ``<root>/_users.json`` written atomically (tmp +
    rename, the artifact-store posture); reads go through an mtime
    check so concurrent engines over one root observe each other's
    writes.  The optional superuser (the engine's own identity) is
    validated config-side and never stored, exactly like the
    reference's superUserName/superUserPassword pair."""

    def __init__(self, root: str, superuser: Optional[str] = None,
                 superuser_password: Optional[str] = None):
        self.path = os.path.join(root, "_users.json")
        self.superuser = superuser
        self.superuser_password = superuser_password
        self._lock = threading.Lock()
        self._cache: Dict[str, dict] = {}
        self._mtime: Optional[float] = None

    # -- storage ------------------------------------------------------------
    def _load(self) -> Dict[str, dict]:
        try:
            mt = os.path.getmtime(self.path)
        except OSError:
            self._cache, self._mtime = {}, None
            return self._cache
        if mt != self._mtime:
            with open(self.path, encoding="utf-8") as f:
                self._cache = json.load(f)
            self._mtime = mt
        return self._cache

    def _store(self, users: Dict[str, dict]) -> None:
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(self.path),
                                   prefix="_users", suffix=".json")
        with os.fdopen(fd, "w", encoding="utf-8") as f:
            json.dump(users, f, indent=1, sort_keys=True)
        os.replace(tmp, self.path)
        self._cache = users
        try:
            self._mtime = os.path.getmtime(self.path)
        except OSError:
            self._mtime = None

    # -- UserManager surface (UserManager.scala:26-55) ----------------------
    def create_user(self, name: str, password: Optional[str],
                    role: Optional[str]) -> YupanaUser:
        r = "DISABLED" if role is None else role_by_name(role)
        if r is None:
            raise AuthError(f"Invalid role name '{role}'")
        with self._lock:
            users = dict(self._load())
            if name in users or name == self.superuser:
                raise AuthError("User already exists")
            h = hash_password(password or "")
            users[name] = {"password": h, "role": r}
            self._store(users)
        return YupanaUser(name, h, r)

    def update_user(self, name: str, password: Optional[str],
                    role: Optional[str]) -> None:
        r = None
        if role is not None:
            r = role_by_name(role)
            if r is None:
                raise AuthError(f"Invalid role name '{role}'")
        with self._lock:
            users = dict(self._load())
            if name not in users:
                raise AuthError("User not found")
            u = dict(users[name])
            if password is not None:
                u["password"] = hash_password(password)
            if r is not None:
                u["role"] = r
            users[name] = u
            self._store(users)

    def delete_user(self, name: str) -> bool:
        with self._lock:
            users = dict(self._load())
            if name not in users:
                return False
            del users[name]
            self._store(users)
        return True

    def find_user(self, name: str) -> Optional[YupanaUser]:
        with self._lock:
            u = self._load().get(name)
        if u is None:
            return None
        return YupanaUser(name, u["password"], u["role"])

    def list_users(self) -> List[YupanaUser]:
        with self._lock:
            users = self._load()
            return [YupanaUser(n, u["password"], u["role"])
                    for n, u in sorted(users.items())]

    def count(self) -> int:
        with self._lock:
            return len(self._load())

    def validate_user(self, name: str,
                      password: Optional[str]) -> Optional[YupanaUser]:
        """≙ UserManager.validateUser: the config superuser matches on
        the raw pair; everyone else verifies against the stored hash."""
        if self.superuser is not None and name == self.superuser \
                and password == self.superuser_password:
            return YupanaUser(name, None, "ADMIN")
        u = self.find_user(name)
        if u is not None and verify_password(password or "",
                                             u.password_hash or ""):
            return u
        return None
