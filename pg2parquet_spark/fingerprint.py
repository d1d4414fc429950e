"""Function-level query fingerprints (r8 verdict #3).

The change-aware verification rotation needs to know whether the CODE behind
a driver-green query has drifted since the round that verified it.  Module
git-blob granularity (rounds 7-8) was deliberately conservative but churned
the backlog: a docstring edit to ``dedup.py`` re-flagged ~20 queries whose
semantics had not moved, which is why the group-0 backlog sat at 62 against
a target of 35.

This module computes a SEMANTIC fingerprint per registered query from the
module's source text alone (so the same code runs over historical git blobs
in ``tools/fingerprints.py`` and over the working tree in
``registry._changed_since_verified``):

- parse the module with :mod:`ast` — comments and formatting vanish for free;
- strip docstrings everywhere and the ``doc=`` keyword from ``@register``
  decorator calls (prose, not semantics; the ``oracle=`` SQL string stays —
  it IS the comparison contract);
- a query's fingerprint hashes its own normalized ``FunctionDef`` (decorators
  included, hence the oracle) PLUS the normalized dumps of every top-level
  node it transitively references by name — helper functions, module
  constants, imports, and OTHER query functions (the streaming guard oracle
  is composed from the assign query's helper precisely so they cannot drift;
  the closure walk keeps that coupling visible to the rotation) — plus any
  top-level statements that define no name (conditional registration,
  module-level side effects), which are conservatively folded into every
  query in the module.

A query whose fingerprint cannot be computed (parse failure, dynamic
registration) falls back to module-blob comparison in the caller.
"""

from __future__ import annotations

import ast
import hashlib


def _strip_docstrings(node: ast.AST) -> None:
    """Remove docstring statements in-place, recursively."""
    for n in ast.walk(node):
        if isinstance(n, (ast.Module, ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            body = n.body
            if (
                body
                and isinstance(body[0], ast.Expr)
                and isinstance(body[0].value, ast.Constant)
                and isinstance(body[0].value.value, str)
            ):
                del body[0]
                if not body:
                    body.append(ast.Pass())


def _strip_doc_kwarg(node: ast.AST) -> None:
    """Drop ``doc=`` keywords from register(...) decorator calls in-place."""
    for n in ast.walk(node):
        if isinstance(n, ast.Call):
            fn = n.func
            is_register = (isinstance(fn, ast.Name) and fn.id == "register") or (
                isinstance(fn, ast.Attribute) and fn.attr == "register"
            )
            if is_register:
                n.keywords = [k for k in n.keywords if k.arg != "doc"]


def registered_name(node: ast.stmt) -> str | None:
    """The literal query name if ``node`` is an ``@register("name", ...)``
    function, else None."""
    if not isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
        return None
    for deco in node.decorator_list:
        if isinstance(deco, ast.Call):
            fn = deco.func
            is_register = (isinstance(fn, ast.Name) and fn.id == "register") or (
                isinstance(fn, ast.Attribute) and fn.attr == "register"
            )
            if is_register and deco.args and isinstance(deco.args[0], ast.Constant):
                v = deco.args[0].value
                if isinstance(v, str):
                    return v
    return None


def _defined_names(node: ast.stmt) -> list[str]:
    """Top-level names a statement binds (what a ``Name`` load can resolve to)."""
    if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
        return [node.name]
    if isinstance(node, ast.Assign):
        out: list[str] = []
        for t in node.targets:
            for n in ast.walk(t):
                if isinstance(n, ast.Name):
                    out.append(n.id)
        return out
    if isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
        return [node.target.id]
    if isinstance(node, (ast.Import, ast.ImportFrom)):
        out = []
        for alias in node.names:
            name = alias.asname or alias.name.split(".")[0]
            if name != "*":
                out.append(name)
        return out
    return []


def _referenced_names(node: ast.AST) -> set[str]:
    return {n.id for n in ast.walk(node) if isinstance(n, ast.Name)}


def _norm_dump(node: ast.stmt) -> str:
    _strip_docstrings(node)
    _strip_doc_kwarg(node)
    return ast.dump(node, include_attributes=False)


def module_fingerprints(source: str) -> dict[str, str]:
    """Map each ``@register``-ed query name in ``source`` to a sha1 over its
    normalized definition + transitive same-module name closure.

    Raises ``SyntaxError`` on unparseable source (caller falls back to blob
    comparison).
    """
    tree = ast.parse(source)
    _strip_docstrings(tree)  # module docstring

    name_to_node: dict[str, ast.stmt] = {}
    query_nodes: dict[str, ast.stmt] = {}
    anonymous: list[ast.stmt] = []  # define no name → fold into every query
    for node in tree.body:
        qname = registered_name(node)
        if qname is not None:
            query_nodes[qname] = node
        defined = _defined_names(node)
        if defined:
            for d in defined:
                name_to_node[d] = node
        elif qname is None:
            anonymous.append(node)

    # normalized dump per top-level node, computed once (id-keyed)
    dump_cache: dict[int, str] = {}

    def dump_of(node: ast.stmt) -> str:
        if id(node) not in dump_cache:
            dump_cache[id(node)] = _norm_dump(node)
        return dump_cache[id(node)]

    anon_blob = "\n".join(dump_of(n) for n in anonymous)

    out: dict[str, str] = {}
    for qname, qnode in query_nodes.items():
        closure: list[ast.stmt] = []
        seen: set[int] = {id(qnode)}
        frontier = [qnode]
        while frontier:
            cur = frontier.pop()
            for ref in sorted(_referenced_names(cur)):
                tgt = name_to_node.get(ref)
                if tgt is not None and id(tgt) not in seen:
                    seen.add(id(tgt))
                    closure.append(tgt)
                    frontier.append(tgt)
        parts = [dump_of(qnode)]
        parts.extend(sorted(dump_of(n) for n in closure))
        parts.append(anon_blob)
        out[qname] = hashlib.sha1("\x00".join(parts).encode()).hexdigest()
    return out
