"""Offline JSON-LD expansion subset — the engine's P4 stage.

The reference calls ``jsonld.expand(data, {base, documentLoader})`` over the
concatenated jsonld/rdfa/microdata trees (unfurl-html/src/index.ts:52-60,
177-207), where the documentLoader may fetch remote ``@context`` documents.
Executors must never touch the network, so remote contexts are resolved from
a static store (a broadcast side table built by the fixture importer from the
corpus' own cached context sub-requests, e.g. the schema.org context).

Implements the JSON-LD 1.0 expansion surface the corpus exercises:
@context (remote string / inline object / list), @vocab, @base, term
definitions with @id/@type(@id)/@container, compact IRIs, keyword aliases,
@graph, @list/@set, @language, value objects, relative-@id resolution.
Then ``normalize_jsonld`` applies the reference's @graph flatten + page-URL
@id prefix filter (unfurl-html/src/index.ts:191-206).
"""

from __future__ import annotations

from .coerce import whatwg_url

KEYWORDS = {
    "@id", "@type", "@value", "@language", "@graph", "@list", "@set",
    "@context", "@vocab", "@base", "@reverse", "@index", "@container",
}


class ExpansionError(Exception):
    pass


def _is_abs_iri(s: str) -> bool:
    if ":" not in s:
        return False
    scheme = s.split(":", 1)[0]
    return bool(scheme) and all(
        c.isalnum() or c in "+-." for c in scheme) and scheme[0].isalpha()


class Context:
    """Active context: term definitions + @vocab/@base/@language."""

    __slots__ = ("terms", "vocab", "base", "language")

    def __init__(self, base: str | None):
        self.terms: dict[str, dict] = {}
        self.vocab: str | None = None
        self.base = base
        self.language: str | None = None

    def copy(self) -> "Context":
        c = Context(self.base)
        c.terms = dict(self.terms)
        c.vocab = self.vocab
        c.language = self.language
        return c


def _load_context(ctx: Context, local: object, store: dict | None) -> Context:
    """Process an @context value against the active context."""
    if local is None:
        return Context(ctx.base)
    if isinstance(local, list):
        out = ctx
        for item in local:
            out = _load_context(out, item, store)
        return out
    if isinstance(local, str):
        doc = _fetch_context(local, store)
        if doc is None:
            raise ExpansionError(f"remote context unavailable: {local}")
        return _load_context(ctx, doc, store)
    if not isinstance(local, dict):
        raise ExpansionError("invalid @context")
    out = ctx.copy()
    if "@vocab" in local:
        v = local["@vocab"]
        out.vocab = v if isinstance(v, str) else None
    if "@base" in local:
        b = local["@base"]
        out.base = b if isinstance(b, str) else None
    if "@language" in local:
        lang = local["@language"]
        out.language = lang if isinstance(lang, str) else None
    for term, defn in local.items():
        if term.startswith("@"):
            continue
        if defn is None:
            out.terms.pop(term, None)
            continue
        if isinstance(defn, str):
            out.terms[term] = {"@id": defn}
        elif isinstance(defn, dict):
            out.terms[term] = defn
    return out


def _fetch_context(url: str, store: dict | None) -> dict | None:
    if not store:
        return None
    for key in (url, url.rstrip("/")):
        for k in (key, key.replace("https://", "http://"),
                  key.replace("http://", "https://")):
            doc = store.get(k) or store.get(k + "/")
            if doc is not None:
                ctx = doc.get("@context") if isinstance(doc, dict) else None
                return ctx if ctx is not None else (
                    doc if isinstance(doc, dict) else None)
    return None


def _expand_iri(ctx: Context, value: str, vocab_mode: bool,
                resolve_term: bool = True) -> str | None:
    """IRI expansion: keyword / term / compact IRI / @vocab / relative."""
    if value.startswith("@") and value in KEYWORDS:
        return value
    if resolve_term and value in ctx.terms:
        tid = ctx.terms[value].get("@id")
        if not isinstance(tid, str):
            # reverse term defs carry @reverse instead of @id; expanding
            # the key to the reverse property keeps it from being
            # dropped — expand_node routes it via the term def
            tid = ctx.terms[value].get("@reverse")
        if isinstance(tid, str):
            if tid in KEYWORDS:
                return tid
            # a term's @id may itself be a compact IRI (schema:author)
            return _expand_iri(ctx, tid, True, resolve_term=False)
    if ":" in value:
        prefix, _, suffix = value.partition(":")
        if suffix.startswith("//") or prefix == "_":
            return value  # absolute IRI or blank node
        if prefix in ctx.terms:
            pid = ctx.terms[prefix].get("@id")
            if isinstance(pid, str):
                return pid + suffix
        if _is_abs_iri(value):
            return value
    if vocab_mode and ctx.vocab:
        return ctx.vocab + value
    if not vocab_mode and ctx.base:
        return whatwg_url(value, ctx.base) or value
    if vocab_mode:
        return None  # key does not expand to an IRI → dropped
    return value


def _term_def(ctx: Context, key: str) -> dict:
    # compact-IRI keys deliberately get NO inherited term definition —
    # type/container mappings do not apply across a prefix expansion
    return ctx.terms.get(key) or {}


def _expand_value(ctx: Context, tdef: dict, value: object) -> object:
    if isinstance(value, str):
        ttype = tdef.get("@type")
        if ttype == "@id" or ttype == "@vocab":
            iri = _expand_iri(ctx, value, ttype == "@vocab")
            return {"@id": iri if iri is not None else value}
        out: dict = {"@value": value}
        if ttype and isinstance(ttype, str) and not ttype.startswith("@"):
            out["@type"] = _expand_iri(ctx, ttype, True) or ttype
        elif tdef.get("@language") is not None:
            if tdef["@language"]:
                out["@language"] = tdef["@language"]
        elif ctx.language:
            out["@language"] = ctx.language
        return out
    return {"@value": value}


def expand_node(ctx: Context, element: object, store: dict | None,
                active_tdef: dict | None = None) -> object:
    """Expansion algorithm over one element → node/value object or list."""
    if element is None:
        return None
    if isinstance(element, list):
        out = []
        for item in element:
            ex = expand_node(ctx, item, store, active_tdef)
            if ex is None:
                continue
            if isinstance(ex, list):
                out.extend(ex)
            else:
                out.append(ex)
        return out
    if not isinstance(element, dict):
        return _expand_value(ctx, active_tdef or {}, element)

    if "@context" in element:
        ctx = _load_context(ctx, element["@context"], store)

    node: dict = {}
    for key, value in element.items():
        if key == "@context":
            continue
        ekey = _expand_iri(ctx, key, True)
        if ekey is None:
            continue
        if ekey == "@id":
            if isinstance(value, str):
                node["@id"] = _expand_iri(ctx, value, False) or value
            continue
        if ekey == "@type":
            vals = value if isinstance(value, list) else [value]
            types = []
            for v in vals:
                if isinstance(v, str):
                    t = _expand_iri(ctx, v, True)
                    if t:
                        types.append(t)
            if types:
                node["@type"] = types
            continue
        if ekey == "@value":
            node["@value"] = value
            continue
        if ekey == "@language":
            if isinstance(value, str):
                node["@language"] = value
            continue
        if ekey == "@graph":
            g = expand_node(ctx, value, store)
            node["@graph"] = g if isinstance(g, list) else [g]
            continue
        if ekey in ("@list", "@set"):
            items = expand_node(ctx, value, store, active_tdef)
            if not isinstance(items, list):
                items = [items] if items is not None else []
            if ekey == "@list":
                node["@list"] = items
            else:
                return items
            continue
        if ekey == "@reverse":
            # JSON-LD 1.0 §8.1 expansion of the @reverse map: each
            # property expands vocab-mode; only node objects are legal
            # — a value/list object under @reverse is an "invalid
            # reverse property value" error in jsonld.js, which the
            # reference catches by discarding the ENTIRE graph
            # (normalize → None), so raise and let expand() return None
            if isinstance(value, dict):
                rmap = node.setdefault("@reverse", {})
                for rkey, rval in value.items():
                    rprop = _expand_iri(ctx, rkey, True)
                    if rprop is None or rprop.startswith("@"):
                        continue
                    ex = expand_node(ctx, rval, store, _term_def(ctx, rkey))
                    items = ex if isinstance(ex, list) else                         [ex] if ex is not None else []
                    nodes = [n for n in items if isinstance(n, dict)
                             and "@value" not in n and "@list" not in n]
                    if len(nodes) != len(items):
                        raise ExpansionError(
                            "invalid reverse property value")
                    if nodes:
                        rmap.setdefault(rprop, []).extend(nodes)
                if not rmap:
                    node.pop("@reverse", None)
            continue
        if ekey in ("@index", "@container"):
            continue
        if ekey.startswith("@") and ekey in KEYWORDS:
            continue
        tdef = _term_def(ctx, key)
        if "@reverse" in tdef:
            # reverse term definition ({"children": {"@reverse": "p"}}):
            # values attach under the node's @reverse map for property p
            rprop = tdef["@reverse"]
            rprop = _expand_iri(ctx, rprop, True) if isinstance(
                rprop, str) else None
            if rprop and not rprop.startswith("@"):
                ex = expand_node(ctx, value, store, tdef)
                items = ex if isinstance(ex, list) else                     [ex] if ex is not None else []
                nodes = [n for n in items if isinstance(n, dict)
                         and "@value" not in n and "@list" not in n]
                if len(nodes) != len(items):
                    # same jsonld.js "invalid reverse property value"
                    # → reference drops the whole graph
                    raise ExpansionError("invalid reverse property value")
                if nodes:
                    node.setdefault("@reverse", {})                         .setdefault(rprop, []).extend(nodes)
            continue
        container = tdef.get("@container")
        if container == "@language" and isinstance(value, dict):
            vals = []
            for lang, lv in value.items():
                for item in (lv if isinstance(lv, list) else [lv]):
                    if isinstance(item, str):
                        vals.append({"@value": item, "@language": lang})
            node.setdefault(ekey, []).extend(vals)
            continue
        expanded = expand_node(ctx, value, store, tdef)
        if expanded is None:
            continue
        if container == "@list" and isinstance(expanded, list):
            expanded = [{"@list": expanded}]
        if not isinstance(expanded, list):
            expanded = [expanded]
        node.setdefault(ekey, []).extend(expanded)

    if "@value" in node:
        return {k: v for k, v in node.items()
                if k in ("@value", "@type", "@language", "@index")}
    return node


def expand(docs: list, base: str, store: dict | None = None) -> list[dict] | None:
    """``jsonld.expand`` equivalent: list of docs → flat list of expanded
    top-level nodes.  Any expansion error → None (reference catches and
    drops the whole graph, unfurl-html/src/index.ts:185-189)."""
    ctx = Context(base)
    try:
        result = expand_node(ctx, docs, store)
    except ExpansionError:
        return None
    except RecursionError:
        return None
    if result is None:
        return []
    out = result if isinstance(result, list) else [result]
    return [x for x in out if isinstance(x, dict)]


def normalize_jsonld(docs: list, url: str,
                     store: dict | None = None) -> list[dict] | None:
    """Expand + flatten @graph + keep page-scoped nodes
    (unfurl-html/src/index.ts:177-207)."""
    if not docs:
        return None if docs is None else []
    expanded = expand(docs, url, store)
    if expanded is None:
        return None
    id_prefix = url.split("#", 1)[0]
    out: list[dict] = []
    for x in expanded:
        nodes = x.get("@graph") if isinstance(x, dict) else None
        if nodes is None:
            nodes = [x] if x else []
        for n in nodes:
            if not isinstance(n, dict):
                continue
            nid = n.get("@id")
            nid = nid if isinstance(nid, str) else None
            if not nid or nid == id_prefix or nid.startswith(id_prefix + "#"):
                out.append(n)
    return out


def collect_context_urls(element: object) -> set:
    """All remote (string-valued) @context references in a JSON-LD value,
    recursively — the discovery half of the remote-context pre-pass
    (operators/context_prepass.py).  Pure traversal, no resolution."""
    urls: set = set()
    if isinstance(element, dict):
        local = element.get("@context")
        items = local if isinstance(local, list) else [local]
        for item in items:
            if isinstance(item, str) and _is_abs_iri(item):
                urls.add(item)
        for value in element.values():
            urls |= collect_context_urls(value)
    elif isinstance(element, list):
        for value in element:
            urls |= collect_context_urls(value)
    return urls


def context_resolvable(url: str, store: dict | None) -> bool:
    """True when the offline store can satisfy this remote context."""
    return _fetch_context(url, store) is not None
