"""Auth / RBAC for the analytics surfaces (SURVEY §2.K — the one
reference subsystem previously declared out of scope).

Mirrors the reference's entity model (core/auth/): HugeUser →
HugeBelong → HugeGroup → HugeAccess(permission) → HugeTarget(graph +
resource list) — StandardAuthManager.java walks the same chain; the
permission flags are HugePermission.java:26-29 (READ/WRITE/DELETE/
EXECUTE) and the resource kinds ResourceType.java:24-56. Scope is the
ANALYTICS surface: authorization decisions gate the REST adapter's
execute / execute_algorithm / execute_gremlin / execute_schema entry
points (the reference does this in HugeGraphAuthProxy by wrapping
every graph call; our adapter has exactly four doors, so the check
lives at the doors).

No Spark dependency: authorization is a driver-side metadata decision
(micro-scale by construction — users × targets), exactly like the
reference, whose auth entities live in a meta store, not the data
path. An audit export to DataFrames is provided for completeness.
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass, field


class Permission:
    """HugePermission.java:26-29 — combinable bit flags."""
    READ = 0x01
    WRITE = 0x02
    DELETE = 0x04
    EXECUTE = 0x08
    ALL = READ | WRITE | DELETE | EXECUTE

    _NAMES = {READ: "read", WRITE: "write",
              DELETE: "delete", EXECUTE: "execute"}

    @classmethod
    def name(cls, p: int) -> str:
        return "|".join(n for v, n in cls._NAMES.items() if p & v) or "none"


class ResourceType:
    """ResourceType.java:24-56 (the analytics-relevant subset)."""
    VERTEX = "VERTEX"
    EDGE = "EDGE"
    VERTEX_LABEL = "VERTEX_LABEL"
    EDGE_LABEL = "EDGE_LABEL"
    SCHEMA = "SCHEMA"
    GREMLIN = "GREMLIN"
    TASK = "TASK"
    ALL = "ALL"

    #: which concrete types an ALL / SCHEMA grant covers
    _COVERS = {
        ALL: {VERTEX, EDGE, VERTEX_LABEL, EDGE_LABEL, SCHEMA, GREMLIN,
              TASK},
        SCHEMA: {VERTEX_LABEL, EDGE_LABEL, SCHEMA},
    }

    @classmethod
    def covers(cls, granted: str, wanted: str) -> bool:
        return granted == wanted or wanted in cls._COVERS.get(granted, ())


@dataclass
class User:
    name: str
    password_hash: str = ""
    salt: str = ""


@dataclass
class Group:
    name: str


@dataclass
class Target:
    """HugeTarget.java: a named set of resources on one graph in one
    space. ``resources`` is a list of resource-type names; an optional
    ``labels`` whitelist narrows VERTEX/EDGE grants to specific
    labels (HugeResource.java label filters)."""
    name: str
    graph: str
    space: str = "DEFAULT"
    resources: list[str] = field(default_factory=lambda: [ResourceType.ALL])
    labels: list[str] | None = None


@dataclass
class Access:
    group: str
    target: str
    permission: int


class Forbidden(PermissionError):
    """403 — the request's user lacks the needed permission."""


class AuthManager:
    """StandardAuthManager.java re-expressed: entity CRUD + the
    user→belong→group→access→target authorization walk."""

    def __init__(self) -> None:
        import secrets
        self._users: dict[str, User] = {}
        self._groups: dict[str, Group] = {}
        self._targets: dict[str, Target] = {}
        self._belongs: set[tuple[str, str]] = set()   # (user, group)
        self._accesses: list[Access] = []
        # token-signing key: cryptographically random, created BEFORE
        # any login/verify can run — an id(self)-derived key is
        # low-entropy, and a verify-time fallback to '' would let a
        # fresh manager accept tokens signed with the empty key
        # (forgeable by anyone who knows the implementation)
        self._token_secret: str = secrets.token_bytes(32).hex()
        # blacklist entries carry the token's expiry so they can be
        # pruned once the exp check would reject the token anyway
        self._revoked: dict[str, int] = {}

    # -- entity CRUD ---------------------------------------------------

    def create_user(self, name: str, password: str) -> User:
        if name in self._users:
            raise ValueError(f"user {name!r} exists")
        salt = os.urandom(8).hex()
        u = User(name, self._hash(password, salt), salt)
        self._users[name] = u
        return u

    def create_group(self, name: str) -> Group:
        if name in self._groups:
            raise ValueError(f"group {name!r} exists")
        g = Group(name)
        self._groups[name] = g
        return g

    def create_target(self, name: str, graph: str, space: str = "DEFAULT",
                      resources: list[str] | None = None,
                      labels: list[str] | None = None) -> Target:
        if name in self._targets:
            # silently overwriting re-points every Access that
            # references the name — instant unaudited privilege
            # change (review r06); create_user already raises
            raise ValueError(f"target {name!r} exists")
        t = Target(name, graph, space,
                   resources or [ResourceType.ALL], labels)
        self._targets[name] = t
        return t

    def belong(self, user: str, group: str) -> None:
        if user not in self._users or group not in self._groups:
            raise KeyError("unknown user or group")
        self._belongs.add((user, group))

    def grant(self, group: str, target: str, permission: int) -> None:
        if group not in self._groups or target not in self._targets:
            raise KeyError("unknown group or target")
        self._accesses.append(Access(group, target, permission))

    def delete_user(self, name: str) -> None:
        self._users.pop(name, None)
        self._belongs = {(u, g) for u, g in self._belongs if u != name}

    # -- authentication --------------------------------------------------

    @staticmethod
    def _hash(password: str, salt: str) -> str:
        return hashlib.sha256((salt + password).encode()).hexdigest()

    def authenticate(self, name: str, password: str) -> User:
        u = self._users.get(name)
        if u is None or self._hash(password, u.salt) != u.password_hash:
            raise Forbidden("bad credentials")
        return u

    # -- login tokens (api/auth/LoginAPI.java + TokenAPI): login →
    # bearer token, stateless HMAC verify (the reference's JWT slot),
    # logout blacklists ------------------------------------------------

    def login(self, name: str, password: str,
              expire_s: int = 86400, _now=None) -> str:
        """POST /auth/login → token; raises Forbidden on bad creds."""
        import hmac
        import time
        self.authenticate(name, password)
        exp = int((_now or time.time)()) + expire_s
        body = f"{name}|{exp}"
        sig = hmac.new(self._token_secret.encode(), body.encode(),
                       hashlib.sha256).hexdigest()[:32]
        return f"{body}|{sig}"

    def verify_token(self, token: str, _now=None) -> dict:
        """GET /auth/verify → {"user_name": …} or Forbidden."""
        import hmac
        import time
        now = int((_now or time.time)())
        self._prune_revoked(now)
        if token in self._revoked:
            raise Forbidden("token revoked")
        if not self._token_secret:
            # never verify against an absent/empty key — an empty-key
            # HMAC is computable by anyone (forged-token bypass)
            raise Forbidden("no signing key")
        try:
            name, exp, sig = token.rsplit("|", 2)
        except ValueError:
            raise Forbidden("malformed token") from None
        want = hmac.new(self._token_secret.encode(),
                        f"{name}|{exp}".encode(),
                        hashlib.sha256).hexdigest()[:32]
        if not hmac.compare_digest(sig, want):
            raise Forbidden("bad token signature")
        if int(exp) < now:
            raise Forbidden("token expired")
        if name not in self._users:
            # a deleted user's outstanding tokens must stop
            # authenticating immediately, not at expiry (review r06)
            raise Forbidden("unknown user")
        return {"user_name": name}

    def logout(self, token: str, _now=None) -> None:
        """DELETE /auth/logout — blacklist the token until its own
        expiry (after which the exp check rejects it anyway), pruning
        stale entries so the blacklist never grows past the set of
        still-live logged-out tokens. Only tokens bearing a VALID
        signature are stored: a forged token can't authenticate
        anyway, and trusting a forged far-future expiry would let an
        unauthenticated caller grow the blacklist without bound
        (code review r06)."""
        import hashlib as _hl
        import hmac
        import time
        now = int((_now or time.time)())
        self._prune_revoked(now)
        try:
            name, exp_s, sig = token.rsplit("|", 2)
            exp = int(exp_s)
        except (ValueError, IndexError):
            return  # malformed: verify_token rejects it already
        want = hmac.new(self._token_secret.encode(),
                        f"{name}|{exp_s}".encode(),
                        _hl.sha256).hexdigest()[:32]
        if not hmac.compare_digest(sig, want):
            return  # forged: verify_token rejects it already
        self._revoked[token] = exp

    def _prune_revoked(self, now: int) -> None:
        if any(exp < now for exp in self._revoked.values()):
            self._revoked = {t: e for t, e in self._revoked.items()
                             if e >= now}

    # -- admin white-IP list (api/profile/WhiteIpListAPI.java) ---------

    def list_white_ips(self) -> list[str]:
        return sorted(getattr(self, "_white_ips", set()))

    def update_white_ips(self, action_map: dict) -> dict:
        """POST /whiteiplist — {"action": "load"|"remove",
        "ips": [...]}; per-IP outcome buckets like the reference
        (loaded / existed / removed / illegal)."""
        import re
        ips = action_map.get("ips")
        action = action_map.get("action")
        if not isinstance(ips, list):
            raise ValueError("Invalid ips type, must be list")
        if not isinstance(action, str) or not action:
            raise ValueError("Missing argument: action")
        if action not in ("load", "remove"):
            # validated up front — an invalid action with an empty or
            # all-illegal ips list silently "succeeded" (review r06)
            raise ValueError(f"Invalid action '{action}'")
        if not hasattr(self, "_white_ips"):
            self._white_ips = set()
        ipv4 = re.compile(r"^(\d{1,3})\.(\d{1,3})\.(\d{1,3})\.(\d{1,3})$")
        result: dict[str, list] = {"loaded": [], "existed": [],
                                   "removed": [], "illegal": []}
        for ip in ips:
            m = ipv4.match(str(ip))
            if not (m and all(int(g) <= 255 for g in m.groups())):
                result["illegal"].append(ip)
                continue
            if action == "load":
                (result["existed"] if ip in self._white_ips
                 else result["loaded"]).append(ip)
                self._white_ips.add(ip)
            elif action == "remove":
                if ip in self._white_ips:
                    self._white_ips.discard(ip)
                    result["removed"].append(ip)
            else:
                raise ValueError(f"Invalid action '{action}'")
        return {k: sorted(v) for k, v in result.items() if v}

    def ip_allowed(self, ip: str) -> bool:
        """Empty list = filter off (matching the reference, which
        only enforces once IPs are loaded)."""
        store = getattr(self, "_white_ips", set())
        return not store or ip in store

    # -- authorization ---------------------------------------------------

    def check(self, user: str, graph: str, resource: str, permission: int,
              space: str = "DEFAULT", label: str | None = None) -> bool:
        """True iff some group of ``user`` holds ``permission`` on a
        target covering (space, graph, resource[, label]).

        Label scoping is DENY-BY-DEFAULT (r03 advice fix): a target
        restricted to specific labels only covers requests that
        declare a label inside that list — a request with no label
        scope (label=None) is NOT served by a label-restricted grant,
        because our enforcement point is the request, not the element
        (the reference's HugeResource.matchLabel filters per element,
        HugeGraphAuthProxy; a per-request gate that ignored the
        restriction would make the whitelist decorative)."""
        groups = {g for u, g in self._belongs if u == user}
        for a in self._accesses:
            if a.group not in groups or (a.permission & permission) \
                    != permission:
                continue
            t = self._targets.get(a.target)
            if t is None or t.graph != graph or t.space != space:
                continue
            if not any(ResourceType.covers(r, resource)
                       for r in t.resources):
                continue
            if t.labels is not None and (label is None
                                         or label not in t.labels):
                continue
            return True
        return False

    def require(self, user: str, graph: str, resource: str,
                permission: int, space: str = "DEFAULT",
                label: str | None = None) -> None:
        if not self.check(user, graph, resource, permission, space, label):
            raise Forbidden(
                f"user {user!r} lacks {Permission.name(permission)} on "
                f"{space}/{graph}:{resource}"
                + (f"[{label}]" if label else ""))

    def readable_labels(self, user: str, graph: str, resource: str,
                        space: str = "DEFAULT") -> set[str] | None:
        """The label universe ``user`` may READ for ``resource``:
        None = unrestricted (some covering grant has no label list);
        a set = only those labels (union over label-restricted
        grants); no covering grant at all → Forbidden. This is the
        driver-side half of per-element enforcement
        (core/auth/HugeGraphAuthProxy.java HugeResource.matchLabel —
        the reference evaluates it per element; we evaluate the SAME
        predicate once and push it into the scan as a Column
        filter)."""
        groups = {g for u, g in self._belongs if u == user}
        allowed: set[str] = set()
        unrestricted = False
        found = False
        for a in self._accesses:
            if a.group not in groups \
                    or (a.permission & Permission.READ) != Permission.READ:
                continue
            t = self._targets.get(a.target)
            if t is None or t.graph != graph or t.space != space:
                continue
            if not any(ResourceType.covers(r, resource)
                       for r in t.resources):
                continue
            found = True
            # labels=None → unrestricted grant; labels=[] → deny-all
            # whitelist. check() already treats [] as deny-all —
            # `if t.labels:` here silently PROMOTED it to unrestricted
            # (code review r06: privilege escalation through
            # authorized_element_view).
            if t.labels is not None:
                allowed |= set(t.labels)
            else:
                unrestricted = True
        if not found:
            raise Forbidden(
                f"user {user!r} lacks read on {space}/{graph}:{resource}")
        return None if unrestricted else allowed

    # -- audit export ----------------------------------------------------

    def to_dataframes(self, spark) -> dict:
        """Auth entities as DataFrames (audit / reporting)."""
        return {
            "users": spark.createDataFrame(
                [(u.name,) for u in self._users.values()] or [("",)],
                "name string").filter("name <> ''"),
            "belongs": spark.createDataFrame(
                list(self._belongs) or [("", "")],
                "user string, grp string").filter("user <> ''"),
            "accesses": spark.createDataFrame(
                [(a.group, a.target, Permission.name(a.permission))
                 for a in self._accesses] or [("", "", "")],
                "grp string, target string, permission string")
            .filter("grp <> ''"),
        }


#: REST door → (resource type, permission) — the analytics-relevant
#: subset of HugeGraphAuthProxy's per-call guards.
_DOOR_RULES = {
    "traverser": (ResourceType.VERTEX, Permission.READ),
    "algorithm": (ResourceType.TASK, Permission.EXECUTE),
    "gremlin": (ResourceType.GREMLIN, Permission.EXECUTE),
    "cypher": (ResourceType.GREMLIN, Permission.EXECUTE),
    "schema_read": (ResourceType.SCHEMA, Permission.READ),
    "schema_write": (ResourceType.SCHEMA, Permission.WRITE),
}


def authorized_execute(am: AuthManager, user: str, graph_name: str,
                       graph, endpoint: str, request: dict,
                       space: str = "DEFAULT",
                       label: str | None = None):
    """Permission-gated `rest.execute` (traverser endpoints read
    vertices AND edges — both are required, as the reference's
    traverser proxy checks both iterators). ``label`` declares the
    request's label scope; without it, label-restricted grants do not
    apply (deny-by-default, see AuthManager.check)."""
    from incubator_hugegraph_spark import rest
    am.require(user, graph_name, ResourceType.VERTEX, Permission.READ,
               space, label)
    am.require(user, graph_name, ResourceType.EDGE, Permission.READ,
               space, label)
    return rest.execute(graph, endpoint, request)


def authorized_gremlin(am: AuthManager, user: str, graph_name: str,
                       graph, request, space: str = "DEFAULT",
                       label: str | None = None):
    from incubator_hugegraph_spark import rest
    am.require(user, graph_name, ResourceType.GREMLIN, Permission.EXECUTE,
               space, label)
    return rest.execute_gremlin(graph, request)


def authorized_algorithm(am: AuthManager, user: str, graph_name: str,
                         graph, name: str, params: dict | None = None,
                         space: str = "DEFAULT",
                         label: str | None = None):
    from incubator_hugegraph_spark import rest
    am.require(user, graph_name, ResourceType.TASK, Permission.EXECUTE,
               space, label)
    return rest.execute_algorithm(graph, name, params)


def authorized_element_view(am: AuthManager, user: str, graph_name: str,
                            graph, space: str = "DEFAULT"):
    """Element-level label enforcement (closes the documented
    request-level-only deviation): a PropertyGraph whose vertex/edge
    tables expose ONLY rows whose label the user may read — the
    reference filters each element through HugeResource.matchLabel in
    HugeGraphAuthProxy; here the same predicate is a Column filter
    pushed into the parquet scan (partition-prunable, zero per-row
    Python). Edges additionally require BOTH endpoints readable —
    vertex ids splice the label first (``label!key``), so endpoint
    visibility is an id-membership semi-join. Raises Forbidden when
    the user has no read grant at all. Traversals run on the returned
    graph exactly as on the full one (same schema, same views
    machinery)."""
    from pyspark.sql import functions as F

    from incubator_hugegraph_spark.graph import PropertyGraph
    # a missing grant for ONE kind hides that kind, it does not deny
    # the whole view (the reference proxy filters per element — a
    # vertex-only reader sees vertices and zero edges); Forbidden only
    # when NEITHER kind has any covering grant
    try:
        vlabels = am.readable_labels(user, graph_name,
                                     ResourceType.VERTEX, space)
        v_ok = True
    except Forbidden:
        vlabels, v_ok = set(), False
    try:
        elabels = am.readable_labels(user, graph_name,
                                     ResourceType.EDGE, space)
        e_ok = True
    except Forbidden:
        elabels, e_ok = set(), False
    if not v_ok and not e_ok:
        raise Forbidden(
            f"user {user!r} lacks read on {space}/{graph_name}")
    if e_ok and not v_ok:
        # an edge-only grant is unusable: every edge row names its two
        # endpoint ids, so exposing edges without ANY vertex grant
        # would leak hidden vertices — raise instead of silently
        # returning an empty graph the caller can't distinguish from
        # an authorized-but-empty one
        raise Forbidden(
            f"user {user!r} holds an edge read grant on "
            f"{space}/{graph_name} but no vertex grant — edge rows "
            "name their endpoint vertex ids, so edge visibility "
            "requires vertex visibility")
    if vlabels is None and elabels is None:
        return graph
    v, e = graph.vertices, graph.edges
    if vlabels is not None:
        v = v.filter(F.col("label").isin(sorted(vlabels))
                     if vlabels else F.lit(False))
    if elabels is not None:
        e = e.filter(F.col("label").isin(sorted(elabels))
                     if elabels else F.lit(False))
    if vlabels is not None:
        # an edge whose endpoint the user cannot see would leak the
        # hidden vertex's id — require both endpoints VISIBLE, i.e.
        # present in the already-filtered vertex table. A semi-join on
        # the id set (not a substring parse of the 'label!' prefix)
        # also covers vertices written with explicit user-supplied ids
        # that carry no label splice (r05 ADVICE — the prefix parse
        # hid their edges even when both endpoint labels were
        # granted). The reference checks per-element matchLabel
        # (HugeGraphAuthProxy); here the label filter on v already
        # encodes that, so endpoint visibility reduces to id
        # membership. Catalyst broadcasts the visible-id side when it
        # is small; at scale the two semi-joins shuffle on the same
        # key the edge table is typically bucketed by (src).
        if not vlabels:
            e = e.filter(F.lit(False))
        else:
            vis = v.select(F.col("id").alias("__vis_id"))
            e = (e.join(vis, e["src"] == F.col("__vis_id"), "leftsemi")
                 .join(vis, e["dst"] == F.col("__vis_id"), "leftsemi"))
    return PropertyGraph(graph.spark, v, e, schema=graph.schema)


def authorized_schema(am: AuthManager, user: str, graph_name: str,
                      schema, method: str, path: str,
                      payload: dict | None = None,
                      space: str = "DEFAULT"):
    from incubator_hugegraph_spark import rest
    m = method.upper()
    # DELETE requires the DELETE permission bit — the reference's
    # HugeGraphAuthProxy distinguishes removals from writes
    # (HugePermission.DELETE); mapping DELETE→WRITE let a WRITE-only
    # user drop schema elements (code review r06)
    needed = Permission.READ if m == "GET" \
        else Permission.DELETE if m == "DELETE" else Permission.WRITE
    am.require(user, graph_name, ResourceType.SCHEMA, needed, space)
    return rest.execute_schema(schema, method, path, payload)
