"""Language-level conformance tests for the jsvm interpreter.

jsvm (kjarni_tpu/export/jsvm) exists to execute web/kjarni.js for real
(test_js_execution.py). These tests pin the *language semantics* that
execution relies on, so an interpreter regression fails here with a
one-line repro instead of deep inside a model forward pass. The scope is
deliberate: what kjarni.js uses must work; what jsvm does not implement
must fail LOUDLY at parse time (JSSyntaxError), never misexecute.
"""

import importlib
import shutil
import sys
from pathlib import Path

import pytest

import kjarni_tpu.export.jsvm as jsvm_pkg
from kjarni_tpu.export.jsvm import JSSyntaxError, js_to_host, run_source


def ev(src: str):
    """Run a snippet that assigns `var out = ...`; return out as host value."""
    return js_to_host(run_source(src).globals.get("out"))


# ---------------------------------------------------------------------------
# Table-driven conformance: (id, source, expected `out`).
#
# One entry per semantic rule web/kjarni.js + web/kjarni-search.js lean on.
# The table is shared with the mutation canary below: a seeded interpreter
# bug must flip at least one row, so every row doubles as a tripwire. Keep
# `out` a str/bool/int/float (no NaN at top level — stringify instead).
# ---------------------------------------------------------------------------

TABLE = [
    # --- evaluation order ---
    ("args-left-to-right",
     "let log=[]; const t=(x)=>{log.push(x); return x;};"
     "((a,b,c)=>0)(t(1),t(2),t(3)); var out=log.join(',');", "1,2,3"),
    ("callee-before-args",
     "function f(){return 1;} function g(){return 2;}"
     "var out=f(f=g) + ',' + f();", "1,2"),
    ("compound-target-resolved-once",
     "let i=0; const a=[10,20]; a[i++] += 5; var out=a[0]+','+i;", "15,1"),
    ("ternary-lazy",
     "let n=0; const v=(true ? 1 : ++n); var out=n+v;", 1),
    ("logical-short-circuit",
     "let s=''; const t=(x,v)=>{s+=x; return v;};"
     "t('a',false) && t('b',true); t('c',true) || t('d',true);"
     "var out=s;", "ac"),
    ("nullish-lazy",
     "let n=0; const v=(1 ?? ++n); var out=n+','+v;", "0,1"),
    ("postfix-vs-prefix",
     "let i=1; const a=i++; const b=++i; var out=a+','+b+','+i;", "1,3,3"),
    ("object-literal-order",
     "let log=[]; const t=(x)=>{log.push(x); return x;};"
     "const o={a:t(1), b:t(2)}; var out=log.join('')+o.a+o.b;", "1212"),
    ("assignment-evaluates-rhs-once",
     "let n=0; let x; x = ++n; x = ++n; var out=n;", 2),
    # --- coercion ---
    ("plus-string-concat", "var out=(1+'2') + '|' + ('' + 12.5);", "12|12.5"),
    ("minus-coerces", "var out=('5'-2) + ((' 8 ')*2);", 19),
    ("unary-plus", "var out=(+'')+','+(+'3.5')+','+(+' 42 ')+','+(+true);",
     "0,3.5,42,1"),
    ("nan-never-equal",
     "var out=''+(NaN===NaN)+(0/0===0/0)+isNaN('x')+isNaN('3');",
     "falsefalsetruefalse"),
    ("loose-eq-rules",
     "var out=''+(''==0)+'|'+(null==undefined)+'|'+(null==0)+'|'"
     "+('1'==1)+'|'+(true==1)+'|'+('abc'==0);",
     "true|true|false|true|true|false"),
    ("strict-eq-no-coerce",
     "var out=('1'===1) || (0===false) || (null===undefined);", False),
    ("number-fn", "var out=Number('')+Number('8')+Number(true);", 9),
    ("string-fn",
     "var out=String(12.5)+String(null)+String(undefined)+String(false);",
     "12.5nullundefinedfalse"),
    ("boolean-fn",
     "var out=''+Boolean('')+Boolean('0')+Boolean(0)+Boolean([]);",
     "falsetruefalsetrue"),
    ("truthiness-filter",
     "var out=['','0',0,[],{},null,undefined,NaN].filter(x=>x).length;", 3),
    ("int32-wrap", "var out=((1<<31)|0) + ',' + (0xFFFFFFFF|0);",
     "-2147483648,-1"),
    ("modulo-sign", "var out=(-7%3)+','+(7%-3);", "-1,1"),
    ("division-edges", "var out=(1/0)+','+(-1/0)+','+(0/0);",
     "Infinity,-Infinity,NaN"),
    ("string-comparison",
     "var out=''+('abc'<'abd')+('10'<'9')+('10'<9);", "truetruefalse"),
    # --- typed arrays / aliasing ---
    ("ta-nonzero-offset-aliases",
     "const b=new ArrayBuffer(8); const f=new Float32Array(b); f[1]=2.5;"
     "const g=new Float32Array(b,4); var out=g[0]+','+g.length;", "2.5,1"),
    ("ta-offset-and-length",
     "const b=new ArrayBuffer(16); const v=new Float32Array(b,4,2);"
     "var out=v.length;", 2),
    ("ta-subarray-aliases",
     "const f=new Float32Array(4); const s=f.subarray(1,3); s[0]=7;"
     "var out=f[1]+','+s.length;", "7,2"),
    ("ta-slice-copies",
     "const f=new Float32Array([1,2,3]); const s=f.slice(1); s[0]=9;"
     "var out=f[1]+','+s[0];", "2,9"),
    ("ta-set-with-offset",
     "const f=new Float32Array(4); f.set([5,6],2);"
     "var out=f.join(',');", "0,0,5,6"),
    ("ta-bytes-alias-int32",
     "const b=new ArrayBuffer(4); const u=new Uint8Array(b);"
     "const i=new Int32Array(b); u[0]=255;u[1]=255;u[2]=255;u[3]=255;"
     "var out=i[0];", -1),
    ("ta-cross-dtype-construct",
     "const f=new Float32Array([1.9,-2.5]); const i=new Int32Array(f);"
     "var out=i[0]+','+i[1];", "1,-2"),
    ("ta-reduce-and-fill",
     "var out=new Float32Array([1,2,3]).reduce((a,b)=>a+b,0)"
     "+new Float32Array(2).fill(2)[1];", 8),
    # --- closures / functions ---
    ("let-per-iteration-capture",
     "let fns=[]; for(let i=0;i<3;i++){fns.push(()=>i);}"
     "var out=fns.map(f=>f()).join('');", "012"),
    ("default-params",
     "const f=(a,b=a+1)=>a+b; var out=f(2)+','+f(2,10);", "5,12"),
    ("rest-and-spread-call",
     "const f=(a,...r)=>''+a+r.length+r[0]; var out=f(1,20,30);", "1220"),
    ("arrow-this-lexical",
     "class A{constructor(){this.v=5;} go(){return [1].map(()=>this.v)[0];}}"
     "var out=new A().go();", 5),
    ("throw-catch-message",
     "let r; try { (()=>{throw new TypeError('boom');})(); }"
     "catch(e) { r=e.message; } var out=r;", "boom"),
    # --- strings / regex ---
    ("replace-with-function",
     "var out='a1b2'.replace(/\\d/g, m=>String(Number(m)*2));", "a2b4"),
    ("match-global", "var out='aa bb'.match(/\\w+/g).join('|');", "aa|bb"),
    ("split-regex", "var out='a1b22c'.split(/\\d+/).join('-');", "a-b-c"),
    ("slice-and-charcode",
     "var out='hello'.slice(-3)+'hello'.charCodeAt(1);", "llo101"),
    ("pad-repeat-trim",
     "var out='5'.padStart(3,'0')+'ab'.repeat(2)+'  x  '.trim()"
     "+'abc'.startsWith('ab');", "005ababxtrue"),
    ("tokenize-regex-split",
     "var out='The Dr.-X ok'.toLowerCase().split(/[^0-9a-z]+/)"
     ".filter(t=>t.length>=2).join(',');", "the,dr,ok"),
    # --- arrays / destructuring ---
    ("splice",
     "const a=[1,2,3,4]; const r=a.splice(1,2,9);"
     "var out=a.join(',')+'|'+r.join(',');", "1,9,4|2,3"),
    ("flat-depth", "var out=[1,[2,[3]]].flat(2).join(',');", "1,2,3"),
    ("find-some-every",
     "var out=[1,2,3].findIndex(x=>x>1)+','+[1,2].some(x=>x>1)"
     "+','+[1,2].every(x=>x>0);", "1,true,true"),
    ("destructuring",
     "const {a, b:{c}} = {a:1, b:{c:2}}; const [x,,y=5] = [7,8];"
     "var out=a+c+x+y;", 15),
    ("spread-array-object-keys",
     "const a=[1,2]; const b=[...a,3];"
     "var out=b.join('')+Object.keys({x:1}).length;", "1231"),
    ("for-of-destructuring",
     "let s=''; for (const [k,v] of [['a',1],['b',2]]) { s+=k+v; }"
     "var out=s;", "a1b2"),
    ("sort-comparator-stable-pairs",
     "var out=[[2,'a'],[1,'b'],[2,'c']].sort((x,y)=>x[0]-y[0])"
     ".map(p=>p[1]).join('');", "bac"),
    # --- async (jsvm resolves synchronously) ---
    ("then-chain",
     "var out=null; Promise.resolve(1).then(x=>x+1).then(x=>{out=x*2;});", 4),
    ("promise-all-order",
     "var out=null; (async()=>{const r=await Promise.all("
     "[Promise.resolve('a'),'b',Promise.resolve('c')]);"
     "out=r.join('');})();", "abc"),
    # --- Math ---
    ("math-basics",
     "var out=Math.max(1,5,3)+Math.min(2,0)+Math.floor(2.7)+Math.sqrt(9)"
     "+Math.abs(-2)+Math.round(2.5)+Math.round(-2.5);", 13),
    ("math-exp-log",
     "var out=Math.abs(Math.log(Math.exp(1))-1)<1e-12;", True),
]


def _check_row(run_src, to_host, src, want):
    got = to_host(run_src(src).globals.get("out"))
    if isinstance(want, bool) or isinstance(got, bool):
        return got is want
    if isinstance(want, (int, float)) and isinstance(got, (int, float)):
        return got == want
    return got == want


class TestConformanceTable:
    @pytest.mark.parametrize(
        "src,want", [(s, w) for _, s, w in TABLE],
        ids=[tid for tid, _, _ in TABLE])
    def test_row(self, src, want):
        got = js_to_host(run_source(src).globals.get("out"))
        assert _check_row(run_source, js_to_host, src, want), \
            f"got {got!r}, want {want!r}"


# ---------------------------------------------------------------------------
# Mutation canary: seed a realistic interpreter bug into a scratch copy of
# the package and require the conformance TABLE (not the end-to-end model
# equalities) to catch it. Anchors are exact source strings asserted unique,
# so interp.py refactors fail here loudly instead of silently disarming a
# mutation.
# ---------------------------------------------------------------------------

MUTATIONS = [
    ("eval-order-args-right-to-left",
     """        args = []
        for a in arg_nodes:
            if a[0] == "Spread":
                args.extend(self._iterate(self.eval(a[1], env)))
            else:
                args.append(self.eval(a, env))
        return args""",
     """        args = []
        for a in reversed(arg_nodes):
            if a[0] == "Spread":
                args.extend(self._iterate(self.eval(a[1], env)))
            else:
                args.append(self.eval(a, env))
        return args[::-1]"""),
    ("eval-order-ternary-eager",
     """        return self.eval(node[2], env) if truthy(self.eval(node[1], env)) \\
            else self.eval(node[3], env)""",
     """        a = self.eval(node[2], env)
        b = self.eval(node[3], env)
        return a if truthy(self.eval(node[1], env)) else b"""),
    ("postfix-returns-new-value",
     "        return new if prefix else old",
     "        return new"),
    ("coercion-empty-string-nan",
     """        s = v.strip()
        if not s:
            return 0""",
     """        s = v.strip()
        if not s:
            return float("nan")"""),
    ("coercion-plus-requires-both-strings",
     "        if isinstance(a, str) or isinstance(b, str):",
     "        if isinstance(a, str) and isinstance(b, str):"),
    ("typedarray-offset-ignored",
     """        byte_off = int(to_number(args[1])) if len(args) > 1 and \\
            args[1] is not UNDEFINED else 0""",
     "        byte_off = 0"),
]


def _mutant_run_source(tmp_path, name, old, new):
    """Copy the jsvm package, apply one textual mutation, import the copy."""
    pkg_dir = Path(jsvm_pkg.__file__).parent
    dst = tmp_path / name
    shutil.copytree(pkg_dir, dst, ignore=shutil.ignore_patterns("__pycache__"))
    interp = dst / "interp.py"
    text = interp.read_text()
    assert text.count(old) == 1, f"mutation anchor not unique for {name}"
    interp.write_text(text.replace(old, new))
    sys.path.insert(0, str(tmp_path))
    try:
        mod = importlib.import_module(name)
    finally:
        sys.path.remove(str(tmp_path))
    return mod.run_source, mod.js_to_host


class TestMutationCanary:
    def test_pristine_copy_passes(self, tmp_path):
        """Sanity: an UNmutated scratch copy passes every table row (so a
        canary failure below is attributable to the mutation alone)."""
        run_src, to_host = _mutant_run_source(
            tmp_path, "jsvm_pristine", "        return new if prefix else old",
            "        return new if prefix else old  # noqa: pristine")
        bad = [tid for tid, src, want in TABLE
               if not _check_row(run_src, to_host, src, want)]
        assert not bad, f"pristine copy fails rows: {bad}"

    @pytest.mark.parametrize(
        "name,old,new", MUTATIONS, ids=[m[0] for m in MUTATIONS])
    def test_table_catches_mutation(self, tmp_path, name, old, new):
        run_src, to_host = _mutant_run_source(
            tmp_path, "jsvm_mut_" + name.replace("-", "_"), old, new)
        caught = []
        for tid, src, want in TABLE:
            try:
                ok = _check_row(run_src, to_host, src, want)
            except Exception:
                ok = False
            if not ok:
                caught.append(tid)
        assert caught, f"mutation {name!r} survived the language table"


class TestCoreSemantics:
    def test_closures(self):
        assert ev("let c=(()=>{let n=0; return ()=>++n;})();"
                  "c(); c(); var out=c();") == 3

    def test_classes_and_static(self):
        src = ("class A{constructor(x){this.x=x;}"
               " twice(){return this.x*2;}"
               " static mk(v){return new A(v);}}"
               "var out=new A(5).twice()+A.mk(3).twice();")
        assert ev(src) == 16

    def test_class_inheritance_method_override(self):
        src = ("class A{f(){return 1;}} class B extends A{g(){return 2;}}"
               "const b=new B(); var out=b.f()+b.g()+(b instanceof A);")
        assert ev(src) == 4  # true coerces to 1

    def test_for_loops_and_comma(self):
        assert ev("let s=0; for(let i=0,j=10;i<j;i++,j--){s++;} var out=s;") == 5
        assert ev("let i=0; do { i++; } while (i<3); var out=i;") == 3

    def test_try_catch(self):
        assert ev("let r; try { null.x; } catch (e) { r='caught'; }"
                  "var out=r;") == "caught"

    def test_ternary_nullish_typeof(self):
        assert ev("const v=null; var out=(v ?? 'd') + (typeof 'x');") == "dstring"

    def test_bit_ops_and_exponent(self):
        assert ev("var out=((0xF0|0x0F)^0xFF) + (5<<2) + (-8>>>28) + 2**3;") == 43

    def test_json_roundtrip(self):
        assert ev("var out=JSON.parse(JSON.stringify({a:[1,{b:'x'}]})).a[1].b;"
                  ) == "x"

    def test_string_methods(self):
        assert ev("var out='Hello World'.toLowerCase().split(' ')"
                  ".map(s=>s.padStart(6,'_')).join('|');") == "_hello|_world"

    def test_sort_with_comparator(self):
        assert ev("var out=[3,1,2].sort((a,b)=>a-b).join(',');") == "1,2,3"


class TestBuiltinConstructors:
    def test_instanceof_builtin(self):
        assert ev("var out=[1] instanceof Array;") is True
        assert ev("var out='x' instanceof Array;") is False
        assert ev("var out=new Float32Array(2) instanceof Float32Array;") is True
        assert ev("var out=new Float32Array(2) instanceof Uint8Array;") is False
        assert ev("var out=new ArrayBuffer(4) instanceof ArrayBuffer;") is True

    def test_instanceof_user_class_chain(self):
        assert ev("class A{} class B extends A{}"
                  "var out=(new B() instanceof A) && !(new A() instanceof B);"
                  ) is True

    def test_array_constructor(self):
        assert ev("var out=new Array(3).length + Array(1,2).length;") == 5
        assert ev("var out=Array.isArray([]) && !Array.isArray('s');") is True

    def test_typed_array_over_buffer(self):
        src = ("const buf=new ArrayBuffer(16);"
               "const f=new Float32Array(buf); f[0]=1.5;"
               "const u=new Uint8Array(buf,0,4);"
               "var out=f[0]+u.length;")
        assert ev(src) == 5.5

    def test_regex(self):
        assert ev(r"var out=/\p{L}+/u.test('héllo') ? 1 : 0;") == 1
        assert ev(r"var out='a1b2'.replace(/\d/g, '');") == "ab"


class TestAsyncSemantics:
    """jsvm executes async synchronously: every promise is already
    resolved. These pin the flattening rules KjarniModel.load depends on."""

    def test_async_function_returns_thenable(self):
        assert ev("async function go(){ return 20+1; }"
                  "var out=null; go().then(v=>{out=v;});") == 21

    def test_await_unwraps(self):
        assert ev("async function f(){return 7;} var out=null;"
                  "(async()=>{out=(await f())+1;})();") == 8

    def test_then_flattens_promise_of_promise(self):
        src = ("var out=null; (async()=>{"
               "const [a,b]=await Promise.all(["
               "Promise.resolve(1).then(x=>Promise.resolve(x+1)), 5]);"
               "out=a+b; })();")
        assert ev(src) == 7

    def test_iife_async(self):
        assert ev("var out=null; (async () => { out = await 'done'; })();"
                  ) == "done"


class TestLoudFailure:
    """Unsupported syntax must raise at parse time, never misexecute."""

    @pytest.mark.parametrize("src", [
        "switch (1) { case 1: break; }",
        "const x = `value ${1+1}`;",
        "function* gen() { yield 1; }",
        "class A { get v() { return 1; } }",
    ])
    def test_unsupported_syntax_raises(self, src):
        with pytest.raises(JSSyntaxError):
            run_source(src)
