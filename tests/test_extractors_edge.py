"""Extractor edge cases, rounding out the reference's 39-test coverage
(`tests/test_extractors.py`): decorated classes, async generators, template
literals with nesting, getters/setters, private fields, regex literals,
re-exports, namespace collisions.
"""

import pytest

from lattice_tpu.core.types import EntityType, Language
from lattice_tpu.parsing.parser import CodeParser


@pytest.fixture(scope="module")
def parser():
    return CodeParser()


class TestPythonEdge:
    def test_decorated_class(self, parser):
        src = "@dataclass(frozen=True)\nclass Point:\n    x: int\n"
        cls = parser.parse_content(src, Language.PYTHON, "m.py").classes[0]
        assert cls.decorators == ["dataclass"]

    def test_async_generator_and_lambda(self, parser):
        src = (
            "async def stream():\n"
            "    async for item in source():\n"
            "        yield transform(item)\n"
            "handler = lambda x: x\n"
        )
        parsed = parser.parse_content(src, Language.PYTHON, "m.py")
        fn = parsed.functions[0]
        assert fn.is_async
        assert "source" in fn.calls and "transform" in fn.calls

    def test_property_and_dunder(self, parser):
        src = (
            "class A:\n"
            "    @property\n"
            "    def size(self):\n"
            "        return len(self._items)\n"
            "    def __repr__(self):\n"
            "        return 'A'\n"
        )
        methods = parser.parse_content(src, Language.PYTHON, "m.py").methods
        names = {m.name for m in methods}
        assert names == {"size", "__repr__"}
        prop = next(m for m in methods if m.name == "size")
        assert "property" in prop.decorators

    def test_multiple_assignment_and_walrus(self, parser):
        src = (
            "def go():\n"
            "    a = b = make()\n"
            "    if (n := count()) > 0:\n"
            "        use(n)\n"
        )
        fn = parser.parse_content(src, Language.PYTHON, "m.py").functions[0]
        assert {"make", "count", "use"} <= set(fn.calls)

    def test_class_in_function(self, parser):
        src = (
            "def factory():\n"
            "    class Inner:\n"
            "        def run(self):\n"
            "            pass\n"
            "    return Inner\n"
        )
        parsed = parser.parse_content(src, Language.PYTHON, "m.py")
        inner = next(e for e in parsed.all_entities if e.name == "Inner")
        assert inner.qualified_name == "m.factory.Inner"
        assert inner.entity_type == EntityType.CLASS


class TestJavaScriptEdge:
    def test_template_literal_nesting(self, parser):
        src = (
            "function f(a) {\n"
            "  const s = `outer ${inner(`nested ${deep(a)}`)} done`;\n"
            "  return s;\n"
            "}\n"
        )
        fn = parser.parse_content(src, Language.JAVASCRIPT, "m.js").functions[0]
        assert "inner" in fn.calls
        assert "deep" in fn.calls

    def test_regex_literal_not_confused(self, parser):
        src = (
            "function clean(s) {\n"
            "  return s.replace(/class {/g, '');\n"
            "}\n"
            "function after() { return 1; }\n"
        )
        parsed = parser.parse_content(src, Language.JAVASCRIPT, "m.js")
        names = [f.name for f in parsed.functions]
        assert names == ["clean", "after"]

    def test_getter_setter_private(self, parser):
        src = (
            "class Box {\n"
            "  #items = [];\n"
            "  get size() { return this.#items.length; }\n"
            "  set size(v) { throw new Error('no'); }\n"
            "  #secret() { return 42; }\n"
            "}\n"
        )
        methods = parser.parse_content(src, Language.JAVASCRIPT, "m.js").methods
        names = {m.name for m in methods}
        assert "#secret" in names
        assert "size" in names

    def test_generator_methods(self, parser):
        src = (
            "class Seq {\n"
            "  *items() { yield 1; }\n"
            "  async *stream() { yield await fetchOne(); }\n"
            "}\n"
        )
        methods = parser.parse_content(src, Language.JAVASCRIPT, "m.js").methods
        names = {m.name for m in methods}
        assert names == {"items", "stream"}

    def test_iife_not_extracted_as_entity(self, parser):
        src = "(function() { setup(); })();\nconst x = (() => init())();\n"
        parsed = parser.parse_content(src, Language.JAVASCRIPT, "m.js")
        # anonymous IIFEs should not appear; `x` is a const call, not arrow
        assert all(e.name not in ("function",) for e in parsed.all_entities)


class TestTypeScriptEdge:
    def test_abstract_class_and_generics(self, parser):
        src = (
            "export abstract class Repo<T extends Entity> {\n"
            "  abstract find(id: string): Promise<T>;\n"
            "  list(): T[] { return query(this.table); }\n"
            "}\n"
        )
        parsed = parser.parse_content(src, Language.TYPESCRIPT, "m.ts")
        cls = parsed.classes[0]
        assert cls.name == "Repo"
        methods = {m.name for m in parsed.methods}
        assert "list" in methods  # abstract signature (no body) excluded

    def test_namespace_collision_interface_class(self, parser):
        src = (
            "export interface Config { url: string }\n"
            "export class Config {\n"
            "  constructor(public url: string) {}\n"
            "}\n"
        )
        parsed = parser.parse_content(src, Language.TYPESCRIPT, "m.ts")
        types = {(e.name, e.entity_type.value) for e in parsed.entities}
        assert ("Config", "interface") in types
        assert ("Config", "class") in types

    def test_arrow_with_generic_annotation(self, parser):
        src = (
            "export const pick = <T,>(xs: T[], i: number): T => xs[i];\n"
            "export const go = async (u: User): Promise<void> => {\n"
            "  await save(u);\n"
            "};\n"
        )
        parsed = parser.parse_content(src, Language.TYPESCRIPT, "m.ts")
        fns = {f.name for f in parsed.functions}
        assert "go" in fns
        go = next(f for f in parsed.functions if f.name == "go")
        assert go.is_async and "save" in go.calls

    def test_jsx_component(self, parser):
        src = (
            "export function Card({ user }: Props) {\n"
            "  return <div onClick={() => select(user)}>{format(user.name)}</div>;\n"
            "}\n"
        )
        parsed = parser.parse_content(src, Language.TSX, "m.tsx")
        card = parsed.functions[0]
        assert card.name == "Card"
        assert "format" in card.calls


class TestAdversarialLexer:
    """The constructs where masking lexers die quietly (VERDICT r1 #7):
    regex literals containing slashes/quotes, division ambiguity, class
    fields, decorators, async/static/generator method mixes."""

    def test_regex_containing_escaped_slashes(self, parser):
        src = (
            "const re = /https:\\/\\/[a-z]+\\/path/g;\n"
            "function after() { return 1; }\n"
        )
        parsed = parser.parse_content(src, Language.JAVASCRIPT, "m.js")
        assert {f.name for f in parsed.functions} == {"after"}

    def test_regex_containing_quotes(self, parser):
        src = (
            "const re = /don't \"quote\" me/;\n"
            "function after() { return 2; }\n"
        )
        parsed = parser.parse_content(src, Language.JAVASCRIPT, "m.js")
        assert {f.name for f in parsed.functions} == {"after"}

    def test_division_not_taken_as_regex(self, parser):
        src = (
            "function calc(a, b, c) { return a / b / c; }\n"
            "function after() { return 3; }\n"
        )
        parsed = parser.parse_content(src, Language.JAVASCRIPT, "m.js")
        assert {f.name for f in parsed.functions} == {"calc", "after"}

    def test_class_fields_do_not_break_method_scan(self, parser):
        src = (
            "class Widget {\n"
            "  count = 0;\n"
            "  #secret = \"x\";\n"
            "  static kind = \"widget\";\n"
            "  handler = async (e) => { await this.save(e); };\n"
            "  render() { return this.count; }\n"
            "}\n"
        )
        parsed = parser.parse_content(src, Language.JAVASCRIPT, "m.js")
        cls = parsed.classes[0]
        assert cls.name == "Widget"
        assert "render" in {m.name for m in cls.children}

    def test_ts_decorators_on_class_and_members(self, parser):
        src = (
            "@Component({selector: \"app\"})\n"
            "export class AppComponent {\n"
            "  @Input() name: string;\n"
            "  @HostListener(\"click\")\n"
            "  onClick() { return this.name; }\n"
            "}\n"
        )
        parsed = parser.parse_content(src, Language.TYPESCRIPT, "m.ts")
        cls = parsed.classes[0]
        assert cls.name == "AppComponent"
        assert "onClick" in {m.name for m in cls.children}

    def test_async_static_generator_methods(self, parser):
        src = (
            "class Api {\n"
            "  async fetch() { return 1; }\n"
            "  static async create() { return new Api(); }\n"
            "  async *stream() { yield 1; }\n"
            "}\n"
        )
        parsed = parser.parse_content(src, Language.JAVASCRIPT, "m.js")
        names = {m.name for m in parsed.classes[0].children}
        assert names == {"fetch", "create", "stream"}

    def test_default_export_async_function(self, parser):
        src = "export default async function main() { return 42; }\n"
        parsed = parser.parse_content(src, Language.JAVASCRIPT, "m.js")
        main = parsed.functions[0]
        assert main.name == "main" and main.is_async
