"""Auth/RBAC (SURVEY §2.K — core/auth/ parity): entity chain
user→belong→group→access→target, permission flags, resource
coverage, and the gated REST doors."""

from __future__ import annotations

import pytest

from incubator_hugegraph_spark.auth import (
    AuthManager, Forbidden, Permission, ResourceType,
    authorized_algorithm, authorized_execute, authorized_gremlin)
from tests.test_traversers import marko_graph  # noqa: F401 (fixture)


def _mgr():
    am = AuthManager()
    am.create_user("alice", "pw-a")
    am.create_user("bob", "pw-b")
    am.create_group("analysts")
    am.create_group("admins")
    am.belong("alice", "analysts")
    am.belong("bob", "admins")
    am.create_target("hg_read", "hugegraph",
                     resources=[ResourceType.VERTEX, ResourceType.EDGE])
    am.create_target("hg_all", "hugegraph")
    am.grant("analysts", "hg_read", Permission.READ)
    am.grant("admins", "hg_all", Permission.ALL)
    return am


def test_authenticate_and_hashing():
    am = _mgr()
    assert am.authenticate("alice", "pw-a").name == "alice"
    with pytest.raises(Forbidden):
        am.authenticate("alice", "wrong")
    with pytest.raises(Forbidden):
        am.authenticate("nobody", "x")
    # password never stored in the clear
    assert "pw-a" not in repr(am._users["alice"])


def test_check_walks_the_chain():
    am = _mgr()
    assert am.check("alice", "hugegraph", ResourceType.VERTEX,
                    Permission.READ)
    # alice's grant is READ-only, on vertices/edges only
    assert not am.check("alice", "hugegraph", ResourceType.VERTEX,
                        Permission.WRITE)
    assert not am.check("alice", "hugegraph", ResourceType.GREMLIN,
                        Permission.EXECUTE)
    # bob's ALL target + ALL permission covers everything on the graph
    assert am.check("bob", "hugegraph", ResourceType.GREMLIN,
                    Permission.EXECUTE)
    assert am.check("bob", "hugegraph", ResourceType.SCHEMA,
                    Permission.WRITE)
    # wrong graph / wrong space
    assert not am.check("bob", "other", ResourceType.VERTEX,
                        Permission.READ)
    assert not am.check("bob", "hugegraph", ResourceType.VERTEX,
                        Permission.READ, space="prod")


def test_label_scoped_target():
    am = AuthManager()
    am.create_user("carol", "pw")
    am.create_group("g")
    am.belong("carol", "g")
    am.create_target("persons_only", "hugegraph",
                     resources=[ResourceType.VERTEX],
                     labels=["person"])
    am.grant("g", "persons_only", Permission.READ)
    assert am.check("carol", "hugegraph", ResourceType.VERTEX,
                    Permission.READ, label="person")
    assert not am.check("carol", "hugegraph", ResourceType.VERTEX,
                        Permission.READ, label="software")
    # deny-by-default (r03 advice): a request with NO label scope is
    # not served by a label-restricted grant — otherwise the
    # whitelist would be decorative at the request-level doors
    assert not am.check("carol", "hugegraph", ResourceType.VERTEX,
                        Permission.READ)
    # an unrestricted grant still covers label-less requests
    am.create_target("all_v", "hugegraph",
                     resources=[ResourceType.VERTEX])
    am.grant("g", "all_v", Permission.READ)
    assert am.check("carol", "hugegraph", ResourceType.VERTEX,
                    Permission.READ)


def test_gated_rest_doors(marko_graph):
    am = _mgr()
    req = {"source": "person!marko", "max_depth": 1, "direction": "OUT"}
    out = authorized_execute(am, "alice", "hugegraph", marko_graph,
                             "kneighbor", req)
    assert out.count() == 2
    with pytest.raises(Forbidden):
        authorized_gremlin(am, "alice", "hugegraph", marko_graph,
                           "g.V().count()")
    assert authorized_gremlin(am, "bob", "hugegraph", marko_graph,
                              "g.V().count()").head().cnt == 6
    with pytest.raises(Forbidden):
        authorized_algorithm(am, "alice", "hugegraph", marko_graph,
                             "degree_centrality", {"top": 3})
    # revoking membership revokes access
    am.delete_user("alice")
    with pytest.raises(Forbidden):
        authorized_execute(am, "alice", "hugegraph", marko_graph,
                           "kneighbor", req)


def test_audit_export(marko_graph):
    am = _mgr()
    dfs = am.to_dataframes(marko_graph.spark)
    assert dfs["users"].count() == 2
    assert {r.permission for r in dfs["accesses"].collect()} \
        == {"read", "read|write|delete|execute"}


def test_login_tokens_and_white_ips():
    from incubator_hugegraph_spark.auth import AuthManager, Forbidden
    import pytest
    am = AuthManager()
    am.create_user("alice", "pw1")
    with pytest.raises(Forbidden):
        am.login("alice", "wrong")
    tok = am.login("alice", "pw1", expire_s=60, _now=lambda: 1000)
    assert am.verify_token(tok, _now=lambda: 1050) == {
        "user_name": "alice"}
    with pytest.raises(Forbidden):        # expiry honored
        am.verify_token(tok, _now=lambda: 2000)
    with pytest.raises(Forbidden):        # tamper → bad signature
        am.verify_token(tok[:-1] + ("0" if tok[-1] != "0" else "1"),
                        _now=lambda: 1050)
    am.logout(tok)
    with pytest.raises(Forbidden):        # blacklist honored
        am.verify_token(tok, _now=lambda: 1050)
    # white-IP list: load/remove buckets, validation, gate semantics
    assert am.ip_allowed("10.0.0.1")      # empty list = filter off
    r = am.update_white_ips(
        {"action": "load", "ips": ["10.0.0.1", "999.1.1.1", "bad"]})
    assert r == {"loaded": ["10.0.0.1"], "illegal": ["999.1.1.1", "bad"]}
    assert am.update_white_ips(
        {"action": "load", "ips": ["10.0.0.1"]}) == {
        "existed": ["10.0.0.1"]}
    assert am.ip_allowed("10.0.0.1") and not am.ip_allowed("10.9.9.9")
    assert am.update_white_ips(
        {"action": "remove", "ips": ["10.0.0.1"]}) == {
        "removed": ["10.0.0.1"]}
    assert am.ip_allowed("10.9.9.9")
    with pytest.raises(ValueError):
        am.update_white_ips({"action": "explode", "ips": ["1.1.1.1"]})


def test_token_forgery_rejected_on_fresh_manager():
    """A fresh manager (no login yet) must reject a token signed with
    the empty key — the pre-fix getattr(..., '') fallback verified it
    (ADVICE r04 high: authentication bypass)."""
    import hashlib
    import hmac
    import pytest
    from incubator_hugegraph_spark.auth import AuthManager, Forbidden
    am = AuthManager()
    body = "admin|99999999999"
    forged = body + "|" + hmac.new(
        b"", body.encode(), hashlib.sha256).hexdigest()[:32]
    with pytest.raises(Forbidden):
        am.verify_token(forged, _now=lambda: 1000)
    # keys are per-instance random: a token from one manager never
    # verifies on another (id(self)-derived keys could collide after
    # heap reuse; secrets.token_bytes cannot)
    am2 = AuthManager()
    am2.create_user("alice", "pw1")
    tok = am2.login("alice", "pw1", expire_s=60, _now=lambda: 1000)
    with pytest.raises(Forbidden):
        am.verify_token(tok, _now=lambda: 1050)


def test_logout_blacklist_prunes_expired():
    from incubator_hugegraph_spark.auth import AuthManager
    am = AuthManager()
    am.create_user("alice", "pw1")
    t1 = am.login("alice", "pw1", expire_s=60, _now=lambda: 1000)
    t2 = am.login("alice", "pw1", expire_s=60000, _now=lambda: 1000)
    am.logout(t1, _now=lambda: 1005)
    am.logout(t2, _now=lambda: 1005)
    assert len(am._revoked) == 2
    # after t1's expiry passes, any verify/logout prunes it; t2 stays
    am.verify_token(am.login("alice", "pw1", expire_s=60,
                             _now=lambda: 2000),
                    _now=lambda: 2000)
    assert t1 not in am._revoked and t2 in am._revoked


def test_element_level_label_enforcement(marko_graph):
    """authorized_element_view filters per ELEMENT (closes the
    request-level-only deviation vs HugeGraphAuthProxy's
    HugeResource.matchLabel): a label-scoped reader sees only vertices
    of granted labels, and only edges whose own label AND both
    endpoint labels are readable."""
    import pytest
    from incubator_hugegraph_spark.auth import (AuthManager, Forbidden,
                                                Permission, ResourceType,
                                                authorized_element_view)
    am = AuthManager()
    am.create_user("scoped", "pw")
    am.create_group("readers")
    am.belong("scoped", "readers")
    am.create_target("people_only", "hugegraph",
                     resources=[ResourceType.VERTEX, ResourceType.EDGE],
                     labels=["person", "knows"])
    am.grant("readers", "people_only", Permission.READ)

    g = authorized_element_view(am, "scoped", "hugegraph", marko_graph)
    assert set(r.label for r in g.vertices.collect()) <= {"person"}
    labels = set(r.label for r in g.edges.collect())
    assert labels <= {"knows"}
    # no 'created' edges (label not granted) and no endpoint outside
    # the person label universe
    for r in g.edges.collect():
        assert r.src.startswith("person!") and r.dst.startswith("person!")
    # full-universe grant short-circuits to the original graph
    am.create_target("all", "hugegraph")
    am.grant("readers", "all", Permission.READ)
    g2 = authorized_element_view(am, "scoped", "hugegraph", marko_graph)
    assert g2 is marko_graph
    # no grant at all → Forbidden
    am2 = AuthManager()
    am2.create_user("nobody", "pw")
    with pytest.raises(Forbidden):
        authorized_element_view(am2, "nobody", "hugegraph", marko_graph)


def test_element_view_vertex_only_grant(marko_graph):
    """A vertex-only reader sees vertices and ZERO edges — a missing
    grant for one kind hides that kind, it does not deny the whole
    view (code review r05)."""
    from incubator_hugegraph_spark.auth import (AuthManager, Permission,
                                                ResourceType,
                                                authorized_element_view)
    am = AuthManager()
    am.create_user("v_only", "pw")
    am.create_group("g")
    am.belong("v_only", "g")
    am.create_target("v_read", "hugegraph",
                     resources=[ResourceType.VERTEX])
    am.grant("g", "v_read", Permission.READ)
    g = authorized_element_view(am, "v_only", "hugegraph", marko_graph)
    assert g.vertices.count() == marko_graph.vertices.count()
    assert g.edges.count() == 0


def test_element_view_edge_only_grant_forbidden(marko_graph):
    """Edge rows name endpoint vertex ids: an edge-only reader (no
    vertex grant) gets Forbidden, not a silently empty graph (code
    review r05 pass 2)."""
    from incubator_hugegraph_spark.auth import (AuthManager, Forbidden,
                                                Permission, ResourceType,
                                                authorized_element_view)
    am = AuthManager()
    am.create_user("e_only", "pw")
    am.create_group("g")
    am.belong("e_only", "g")
    am.create_target("e_read", "hugegraph",
                     resources=[ResourceType.EDGE])
    am.grant("g", "e_read", Permission.READ)
    with pytest.raises(Forbidden, match="vertex"):
        authorized_element_view(am, "e_only", "hugegraph", marko_graph)


def test_empty_label_whitelist_is_deny_all(marko_graph):
    """Auth review r06 (privilege escalation): a target created with
    labels=[] is a DENY-ALL whitelist on every path — check() always
    treated it so, but readable_labels promoted it to UNRESTRICTED
    and authorized_element_view handed over the full graph."""
    from incubator_hugegraph_spark.auth import (AuthManager, Permission,
                                                ResourceType,
                                                authorized_element_view)
    am = AuthManager()
    am.create_user("u", "pw")
    am.create_group("g")
    am.belong("u", "g")
    am.create_target("none", "hugegraph",
                     resources=[ResourceType.VERTEX, ResourceType.EDGE],
                     labels=[])
    am.grant("g", "none", Permission.READ)
    gv = authorized_element_view(am, "u", "hugegraph", marko_graph)
    assert gv.vertices.count() == 0
    assert gv.edges.count() == 0


def test_schema_delete_requires_delete_permission():
    """Auth review r06: DELETE maps to Permission.DELETE, not WRITE —
    a WRITE-only user cannot drop schema elements (reference
    HugePermission.DELETE)."""
    from incubator_hugegraph_spark.auth import (AuthManager, Forbidden,
                                                Permission, ResourceType,
                                                authorized_schema)
    from incubator_hugegraph_spark.schema import GraphSchema
    am = AuthManager()
    am.create_user("w", "pw")
    am.create_group("g")
    am.belong("w", "g")
    am.create_target("t", "g1", resources=[ResourceType.SCHEMA])
    am.grant("g", "t", Permission.WRITE)
    sch = GraphSchema()
    sch.property_key("name")
    sch.vertex_label("person", properties=("name",),
                 primary_keys=("name",))
    with pytest.raises(Forbidden, match="delete"):
        authorized_schema(am, "w", "g1", sch, "DELETE",
                          "vertexlabels/person")
    # with the DELETE bit it goes through
    am.grant("g", "t", Permission.DELETE)
    authorized_schema(am, "w", "g1", sch, "DELETE",
                      "vertexlabels/person")
    assert "person" not in sch.vertex_labels


def test_token_lifecycle_hardening():
    """Auth review r06: a deleted user's live token stops verifying;
    logout ignores forged tokens (an attacker cannot grow the
    blacklist with fabricated far-future expiries); duplicate
    group/target names raise instead of silently re-pointing
    grants."""
    from incubator_hugegraph_spark.auth import AuthManager, Forbidden
    am = AuthManager()
    am.create_user("mallory", "pw")
    tok = am.login("mallory", "pw")
    assert am.verify_token(tok)["user_name"] == "mallory"
    am.delete_user("mallory")
    with pytest.raises(Forbidden, match="unknown user"):
        am.verify_token(tok)
    # forged token: logout is a no-op, blacklist stays empty
    am.logout("x|99999999999|junk")
    assert am._revoked == {}
    # duplicate names raise
    am.create_group("g")
    with pytest.raises(ValueError, match="exists"):
        am.create_group("g")
    am.create_target("t", "g1")
    with pytest.raises(ValueError, match="exists"):
        am.create_target("t", "g2")
    # invalid white-ip action raises even with empty ips
    with pytest.raises(ValueError, match="Invalid action"):
        am.update_white_ips({"action": "bogus", "ips": []})
