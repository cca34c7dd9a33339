"""Extractor tests on real in-memory source.

Parity model: reference `tests/test_extractors.py` (39 tests over
`CodeParser.parse_content` on inline strings — no mocks, no services).
"""

import pytest

from lattice_tpu.core.types import EntityType, Language
from lattice_tpu.parsing.models import module_qname
from lattice_tpu.parsing.parser import CodeParser


@pytest.fixture(scope="module")
def parser() -> CodeParser:
    return CodeParser()


class TestModuleQName:
    def test_basic(self):
        assert module_qname("app/services/user.py") == "app.services.user"

    def test_init_dropped(self):
        assert module_qname("app/services/__init__.py") == "app.services"

    def test_index_dropped(self):
        assert module_qname("web/components/index.ts") == "web.components"


class TestPythonExtractor:
    def test_imports(self, parser):
        src = (
            "import os\n"
            "import numpy as np\n"
            "from typing import List, Dict\n"
            "from . import sibling\n"
            "from ..pkg import thing\n"
            "from mod import *\n"
        )
        imports = parser.parse_content(src, Language.PYTHON, "m.py").imports
        mods = [(i.module, i.alias, i.is_relative, i.is_wildcard) for i in imports]
        assert ("os", None, False, False) in mods
        assert ("numpy", "np", False, False) in mods
        assert any(i.module == "typing" and i.names == ["List", "Dict"] for i in imports)
        assert any(i.module == "." and i.is_relative for i in imports)
        assert any(i.module == "..pkg" and i.is_relative for i in imports)
        assert any(i.module == "mod" and i.is_wildcard for i in imports)

    def test_function_entity(self, parser):
        src = (
            "def greet(name: str) -> str:\n"
            '    """Say hello."""\n'
            "    return format_name(name)\n"
        )
        parsed = parser.parse_content(src, Language.PYTHON, "pkg/m.py")
        fn = parsed.functions[0]
        assert fn.qualified_name == "pkg.m.greet"
        assert fn.docstring == "Say hello."
        assert "format_name" in fn.calls
        assert fn.signature.startswith("def greet(")
        assert (fn.start_line, fn.end_line) == (1, 3)

    def test_class_with_methods(self, parser):
        src = (
            "class Service(Base, mixins.LogMixin):\n"
            '    """Doc."""\n'
            "    @staticmethod\n"
            "    def helper():\n"
            "        pass\n"
            "    @classmethod\n"
            "    def build(cls):\n"
            "        return cls()\n"
            "    async def run(self):\n"
            "        await self.helper()\n"
        )
        parsed = parser.parse_content(src, Language.PYTHON, "m.py")
        cls = parsed.classes[0]
        assert cls.base_classes == ["Base", "mixins.LogMixin"]
        methods = {m.name: m for m in parsed.methods}
        assert methods["helper"].is_static
        assert methods["build"].is_classmethod
        assert methods["run"].is_async
        assert methods["run"].qualified_name == "m.Service.run"

    def test_decorated_function(self, parser):
        src = "@app.route('/x')\n@cached\ndef handler():\n    pass\n"
        fn = parser.parse_content(src, Language.PYTHON, "m.py").functions[0]
        assert fn.decorators == ["app.route", "cached"]

    def test_nested_function_calls_not_leaked(self, parser):
        src = (
            "def outer():\n"
            "    a()\n"
            "    def inner():\n"
            "        b()\n"
            "    return inner\n"
        )
        parsed = parser.parse_content(src, Language.PYTHON, "m.py")
        outer = next(e for e in parsed.all_entities if e.name == "outer")
        inner = next(e for e in parsed.all_entities if e.name == "inner")
        assert "a" in outer.calls and "b" not in outer.calls
        assert inner.calls == ["b"]
        assert inner.qualified_name == "m.outer.inner"

    def test_syntax_error_tolerated(self, parser):
        parsed = parser.parse_content("def broken(:\n", Language.PYTHON, "m.py")
        assert parsed.entities == []


class TestJavaScriptExtractor:
    def test_es_imports(self, parser):
        src = (
            "import React, { useState, useEffect as ue } from 'react';\n"
            "import * as path from 'path';\n"
            "import './side-effect.css';\n"
        )
        imports = parser.parse_content(src, Language.JAVASCRIPT, "m.js").imports
        react = next(i for i in imports if i.module == "react")
        assert react.alias == "React"
        assert "useState" in react.names and "useEffect" in react.names
        ns = next(i for i in imports if i.module == "path")
        assert ns.alias == "path"
        assert any(i.module == "./side-effect.css" for i in imports)

    def test_commonjs_require(self, parser):
        src = "const { readFile, writeFile } = require('fs');\nconst _ = require('lodash');\n"
        imports = parser.parse_content(src, Language.JAVASCRIPT, "m.js").imports
        fs = next(i for i in imports if i.module == "fs")
        assert set(fs.names) == {"readFile", "writeFile"}
        lodash = next(i for i in imports if i.module == "lodash")
        assert lodash.alias == "_"

    def test_function_and_arrow(self, parser):
        src = (
            "export function add(a, b) {\n  return helper(a) + b;\n}\n"
            "export const fetchData = async (url) => {\n"
            "  const r = await fetch(url);\n  return r.json();\n};\n"
        )
        parsed = parser.parse_content(src, Language.JAVASCRIPT, "web/m.js")
        fns = {f.name: f for f in parsed.functions}
        assert fns["add"].calls == ["helper"]
        assert fns["fetchData"].is_async
        assert "fetch" in fns["fetchData"].calls
        assert fns["add"].qualified_name == "web.m.add"

    def test_class_heritage_and_methods(self, parser):
        src = (
            "export default class UserService extends BaseService {\n"
            "  static create(cfg) { return new UserService(cfg); }\n"
            "  constructor(cfg) { super(cfg); }\n"
            "  async getUser(id) { return format(await this.api.get(id)); }\n"
            "}\n"
        )
        parsed = parser.parse_content(src, Language.JAVASCRIPT, "m.js")
        cls = parsed.classes[0]
        assert cls.base_classes == ["BaseService"]
        methods = {m.name: m for m in parsed.methods}
        assert methods["create"].is_static
        assert "UserService" in methods["create"].calls  # new X() captured
        assert "super" in methods["constructor"].calls
        assert methods["getUser"].is_async

    def test_jsdoc(self, parser):
        src = (
            "/**\n * Adds numbers.\n * @param a first\n */\n"
            "function add(a, b) { return a + b; }\n"
        )
        fn = parser.parse_content(src, Language.JAVASCRIPT, "m.js").functions[0]
        assert fn.docstring is not None
        assert "Adds numbers." in fn.docstring

    def test_strings_and_comments_ignored(self, parser):
        src = (
            "// function fake() {\n"
            "const s = 'class NotAClass {';\n"
            "const t = `function alsoFake() { ${real(1)} }`;\n"
            "/* class Commented {} */\n"
            "function real(x) { return x; }\n"
        )
        parsed = parser.parse_content(src, Language.JAVASCRIPT, "m.js")
        names = [e.name for e in parsed.all_entities]
        assert names == ["real"]

    def test_export_unwrapping(self, parser):
        src = "export default function main() { run(); }\n"
        fn = parser.parse_content(src, Language.JAVASCRIPT, "m.js").functions[0]
        assert fn.name == "main"


class TestTypeScriptExtractor:
    def test_interface(self, parser):
        src = (
            "export interface Props extends Base, Other {\n"
            "  name: string;\n  run(): void;\n}\n"
        )
        parsed = parser.parse_content(src, Language.TYPESCRIPT, "m.ts")
        iface = parsed.interfaces[0]
        assert iface.entity_type == EntityType.INTERFACE
        assert iface.base_classes == ["Base", "Other"]
        assert parsed.methods == []  # interface members are not methods

    def test_type_alias(self, parser):
        src = "export type ID = string | number;\n"
        parsed = parser.parse_content(src, Language.TYPESCRIPT, "m.ts")
        alias = parsed.entities_of_type(EntityType.TYPE_ALIAS)[0]
        assert alias.name == "ID"

    def test_import_type_dedup(self, parser):
        src = (
            "import type { Foo } from './foo';\n"
            "import { Foo } from './foo';\n"
            "import type { OnlyType } from './types';\n"
        )
        imports = parser.parse_content(src, Language.TYPESCRIPT, "m.ts").imports
        foo_imports = [i for i in imports if i.module == "./foo"]
        assert len(foo_imports) == 1 and not foo_imports[0].is_type_only
        assert any(i.module == "./types" and i.is_type_only for i in imports)

    def test_generic_class_with_implements(self, parser):
        src = (
            "export class Widget<T> implements Props {\n"
            "  render(): void { draw(this.items); }\n"
            "  static of<U>(x: U): Widget<U> { return new Widget(); }\n"
            "  get size(): number { return this.items.length; }\n"
            "}\n"
        )
        parsed = parser.parse_content(src, Language.TYPESCRIPT, "m.ts")
        cls = parsed.classes[0]
        assert cls.base_classes == ["Props"]
        methods = {m.name: m for m in parsed.methods}
        assert set(methods) == {"render", "of", "size"}
        assert methods["of"].is_static
