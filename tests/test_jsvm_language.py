"""Language-level conformance tests for the jsvm interpreter.

jsvm (kjarni_tpu/export/jsvm) exists to execute web/kjarni.js for real
(test_js_execution.py). These tests pin the *language semantics* that
execution relies on, so an interpreter regression fails here with a
one-line repro instead of deep inside a model forward pass. The scope is
deliberate: what kjarni.js uses must work; what jsvm does not implement
must fail LOUDLY at parse time (JSSyntaxError), never misexecute.
"""

import pytest

from kjarni_tpu.export.jsvm import JSSyntaxError, js_to_host, run_source


def ev(src: str):
    """Run a snippet that assigns `var out = ...`; return out as host value."""
    return js_to_host(run_source(src).globals.get("out"))


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
