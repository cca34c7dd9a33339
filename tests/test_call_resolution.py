"""Call-resolution cascade tests with a real FunctionRegistry fixture.

Parity model: reference `tests/test_call_processor.py` (builds a real
registry at `:26` and a CallProcessor at `:103`; tests super()/chains/
builtins/imports) plus `tests/test_import_processor.py` and
`tests/test_inheritance_tracker.py`.
"""

import pytest

from lattice_tpu.core.cache import FunctionRegistry
from lattice_tpu.core.types import EntityType, Language
from lattice_tpu.parsing.call_resolution.processor import CallProcessor
from lattice_tpu.parsing.import_processor import ImportProcessor
from lattice_tpu.parsing.inheritance_tracker import InheritanceTracker
from lattice_tpu.parsing.models import CodeEntity
from lattice_tpu.parsing.parser import CodeParser
from lattice_tpu.parsing.type_inference.engine import TypeInferenceEngine
from lattice_tpu.parsing.type_inference.models import TypeSource


@pytest.fixture
def world():
    """A small multi-module world: registry + imports + inheritance."""
    registry = FunctionRegistry()
    ents = {
        "app.models.user.User": "class",
        "app.models.user.User.save": "method",
        "app.models.user.User.validate": "method",
        "app.models.base.BaseModel": "class",
        "app.models.base.BaseModel.__init__": "method",
        "app.models.base.BaseModel.delete": "method",
        "app.services.user_service.UserService": "class",
        "app.services.user_service.UserService.get_user": "method",
        "app.services.user_service.UserService.create": "method",
        "app.utils.helpers.format_name": "function",
        "app.api.routes.handler": "function",
    }
    for qn, et in ents.items():
        registry.register(qn, et)

    imports = ImportProcessor(registry)
    imports.set_local_modules({
        "app.models.user", "app.models.base", "app.services.user_service",
        "app.utils.helpers", "app.api.routes",
    })

    inheritance = InheritanceTracker(registry, imports)
    inheritance.register_class("app.models.base.BaseModel", [],
                               ["__init__", "delete"])
    inheritance.register_class("app.models.user.User", ["BaseModel"],
                               ["save", "validate"])
    inheritance.resolve_all()

    parser = CodeParser()
    return registry, imports, inheritance, parser


def _parse_fn(parser, src, module_path, language=Language.PYTHON):
    parsed = parser.parse_content(src, language, module_path)
    return parsed, parsed.all_entities


class TestImportProcessor:
    def test_python_from_import(self, world):
        registry, imports, _, parser = world
        parsed, _ = _parse_fn(
            parser,
            "from app.models.user import User\nfrom app.utils.helpers import format_name as fmt\n",
            "app/services/user_service.py",
        )
        imap = imports.parse_imports(parsed)
        assert imap["User"] == "app.models.user.User"
        assert imap["fmt"] == "app.utils.helpers.format_name"

    def test_python_relative_import(self, world):
        registry, imports, _, parser = world
        parsed, _ = _parse_fn(
            parser, "from ..models.user import User\nfrom . import helpers\n",
            "app/services/user_service.py",
        )
        imap = imports.parse_imports(parsed)
        assert imap["User"] == "app.models.user.User"
        assert imap["helpers"] == "app.services.helpers"

    def test_python_wildcard(self, world):
        registry, imports, _, parser = world
        parsed, _ = _parse_fn(
            parser, "from app.models.user import *\n", "app/api/routes.py")
        imports.parse_imports(parsed)
        assert imports.resolve_name("app.api.routes", "User") == "app.models.user.User"

    def test_python_aliased_module(self, world):
        registry, imports, _, parser = world
        parsed, _ = _parse_fn(parser, "import app.models.user as models\n", "app/api/routes.py")
        imap = imports.parse_imports(parsed)
        assert imap["models"] == "app.models.user"
        assert imports.resolve_name("app.api.routes", "models.User") == "app.models.user.User"

    def test_js_relative_normalization(self, world):
        registry, imports, _, parser = world
        src = "import { UserService } from '../services/user_service';\n"
        parsed = parser.parse_content(src, Language.TYPESCRIPT, "app/api/routes.ts")
        imap = imports.parse_imports(parsed)
        assert imap["UserService"] == "app.services.user_service.UserService"

    def test_js_default_and_namespace(self, world):
        registry, imports, _, parser = world
        src = "import Svc from './user_service';\nimport * as helpers from '../utils/helpers';\n"
        parsed = parser.parse_content(src, Language.TYPESCRIPT, "app/services/index.ts")
        imap = imports.parse_imports(parsed)
        assert imap["Svc"] == "app.services.user_service"
        assert imap["helpers"] == "app.utils.helpers"


class TestInheritanceTracker:
    def test_parent_resolution(self, world):
        _, _, inheritance, _ = world
        assert inheritance.get_parents("app.models.user.User") == ["app.models.base.BaseModel"]

    def test_mro(self, world):
        _, _, inheritance, _ = world
        mro = inheritance.get_mro("app.models.user.User")
        assert mro == ["app.models.user.User", "app.models.base.BaseModel"]

    def test_find_method_inherited(self, world):
        _, _, inheritance, _ = world
        assert inheritance.find_method("app.models.user.User", "delete") == \
            "app.models.base.BaseModel.delete"
        assert inheritance.find_method("app.models.user.User", "save") == \
            "app.models.user.User.save"

    def test_subclasses(self, world):
        _, _, inheritance, _ = world
        assert inheritance.get_subclasses("app.models.base.BaseModel") == \
            ["app.models.user.User"]
        assert inheritance.is_subclass_of("app.models.user.User",
                                          "app.models.base.BaseModel")

    def test_diamond_mro(self):
        registry = FunctionRegistry()
        for qn in ("m.A", "m.B", "m.C", "m.D"):
            registry.register(qn, "class")
        tracker = InheritanceTracker(registry)
        tracker.register_class("m.A", [])
        tracker.register_class("m.B", ["A"])
        tracker.register_class("m.C", ["A"])
        tracker.register_class("m.D", ["B", "C"])
        tracker.resolve_all()
        mro = tracker.get_mro("m.D")
        assert mro[0] == "m.D" and set(mro) == {"m.D", "m.B", "m.C", "m.A"}
        assert mro.index("m.B") < mro.index("m.C")


class TestCallProcessor:
    @pytest.fixture
    def processor(self, world):
        registry, imports, inheritance, parser = world
        # register the service module's imports
        parsed = parser.parse_content(
            "from app.models.user import User\n"
            "from app.utils.helpers import format_name\n",
            Language.PYTHON, "app/services/user_service.py",
        )
        imports.parse_imports(parsed)
        engine = TypeInferenceEngine(registry, imports)
        return CallProcessor(registry, imports, inheritance, engine), parser

    def _caller(self, parser, src, path="app/services/user_service.py"):
        parsed = parser.parse_content(src, Language.PYTHON, path)
        return parsed.all_entities[-1]

    def test_imported_function(self, processor):
        proc, parser = processor
        caller = self._caller(parser, "def go():\n    format_name('x')\n")
        r = proc.resolve_call("format_name", caller, "app.services.user_service",
                              Language.PYTHON)
        assert r.target_qn == "app.utils.helpers.format_name"
        assert r.resolution == "import"

    def test_var_typed_receiver(self, processor):
        proc, parser = processor
        src = "def go(user: User):\n    user.save()\n"
        caller = self._caller(parser, src)
        r = proc.resolve_call("user.save", caller, "app.services.user_service",
                              Language.PYTHON)
        assert r.target_qn == "app.models.user.User.save"

    def test_constructor_then_method(self, processor):
        proc, parser = processor
        src = "def go():\n    u = User()\n    u.validate()\n"
        caller = self._caller(parser, src)
        r = proc.resolve_call("u.validate", caller, "app.services.user_service",
                              Language.PYTHON)
        assert r.target_qn == "app.models.user.User.validate"

    def test_inherited_method_via_receiver(self, processor):
        proc, parser = processor
        src = "def go(user: User):\n    user.delete()\n"
        caller = self._caller(parser, src)
        r = proc.resolve_call("user.delete", caller, "app.services.user_service",
                              Language.PYTHON)
        assert r.target_qn == "app.models.base.BaseModel.delete"

    def test_super_method(self, processor):
        proc, parser = processor
        src = (
            "class User(BaseModel):\n"
            "    def save(self):\n"
            "        super().delete()\n"
        )
        parsed = parser.parse_content(src, Language.PYTHON, "app/models/user.py")
        caller = parsed.methods[0]
        r = proc.resolve_call("super().delete", caller, "app.models.user",
                              Language.PYTHON, class_qn="app.models.user.User")
        assert r.target_qn == "app.models.base.BaseModel.delete"
        assert r.resolution == "super"

    def test_python_builtin(self, processor):
        proc, parser = processor
        caller = self._caller(parser, "def go(xs):\n    print(len(xs))\n")
        r = proc.resolve_call("len", caller, "app.services.user_service",
                              Language.PYTHON)
        assert r.target_qn == "builtins.len"
        assert r.resolution == "builtin"

    def test_same_module(self, processor):
        proc, parser = processor
        caller = self._caller(parser, "def go():\n    handler()\n", "app/api/routes.py")
        r = proc.resolve_call("handler", caller, "app.api.routes", Language.PYTHON)
        assert r.target_qn == "app.api.routes.handler"
        assert r.resolution == "module"

    def test_self_method(self, processor):
        proc, parser = processor
        src = (
            "class UserService:\n"
            "    def get_user(self):\n"
            "        return self.create()\n"
        )
        parsed = parser.parse_content(src, Language.PYTHON, "app/services/user_service.py")
        caller = parsed.methods[0]
        r = proc.resolve_call("self.create", caller, "app.services.user_service",
                              Language.PYTHON,
                              class_qn="app.services.user_service.UserService")
        assert r.target_qn == "app.services.user_service.UserService.create"

    def test_fuzzy_module_distance(self, processor):
        proc, parser = processor
        caller = self._caller(parser, "def go():\n    get_user(1)\n")
        r = proc.resolve_call("get_user", caller, "app.services.other",
                              Language.PYTHON)
        assert r.target_qn == "app.services.user_service.UserService.get_user"
        assert r.resolution == "fuzzy"

    def test_js_prototype_builtin(self, processor, world):
        proc, parser = processor
        src = "function go(xs) { return xs.map(f); }\n"
        parsed = parser.parse_content(src, Language.JAVASCRIPT, "web/m.js")
        caller = parsed.functions[0]
        r = proc.resolve_call("xs.map", caller, "web.m", Language.JAVASCRIPT)
        assert r.target_qn == "js.builtin.map"

    def test_unresolved_keeps_method_name(self, processor):
        proc, parser = processor
        caller = self._caller(parser, "def go(x):\n    x.frobnicate()\n")
        r = proc.resolve_call("x.frobnicate", caller, "app.services.user_service",
                              Language.PYTHON)
        assert r.target_qn is None
        assert r.method_name == "frobnicate"


class TestTypeInference:
    def test_python_annotations_and_constructors(self, world):
        registry, imports, _, parser = world
        engine = TypeInferenceEngine(registry, imports)
        src = (
            "def go(user: User, raw):\n"
            "    svc = UserService()\n"
            "    name = 'x'\n"
            "    self_like = [1]\n"
        )
        parsed = parser.parse_content(src, Language.PYTHON, "app/m.py")
        vmap = engine.infer_function_types(parsed.functions[0], "app.m",
                                           Language.PYTHON)
        assert vmap.get("user").type_name == "User"
        assert vmap.get("user").source == TypeSource.ANNOTATION
        assert vmap.get("svc").type_name == "UserService"
        assert vmap.get("svc").source == TypeSource.CONSTRUCTOR
        assert vmap.get("name").type_name == "str"

    def test_python_name_convention(self, world):
        registry, imports, _, parser = world
        engine = TypeInferenceEngine(registry, imports)
        src = "def go(user_service):\n    user_service.get_user()\n"
        parsed = parser.parse_content(src, Language.PYTHON, "app/m.py")
        vmap = engine.infer_function_types(parsed.functions[0], "app.m",
                                           Language.PYTHON)
        inf = vmap.get("user_service")
        assert inf.type_name == "UserService"
        assert inf.source == TypeSource.NAME_CONVENTION
        assert inf.confidence == 0.5

    def test_python_self_attrs(self, world):
        registry, imports, _, parser = world
        engine = TypeInferenceEngine(registry, imports)
        src = (
            "class S:\n"
            "    def __init__(self):\n"
            "        self.repo = User()\n"
        )
        parsed = parser.parse_content(src, Language.PYTHON, "app/m.py")
        vmap = engine.infer_function_types(parsed.methods[0], "app.m",
                                           Language.PYTHON, class_qn="app.m.S")
        assert vmap.instance_attrs["repo"].type_name == "User"

    def test_ts_annotations(self, world):
        registry, imports, _, parser = world
        engine = TypeInferenceEngine(registry, imports)
        src = "function go(user: User, n: number, xs: Widget<T>[]) { user.save(); }\n"
        parsed = parser.parse_content(src, Language.TYPESCRIPT, "web/m.ts")
        vmap = engine.infer_function_types(parsed.functions[0], "web.m",
                                           Language.TYPESCRIPT)
        assert vmap.get("user").type_name == "User"
        assert vmap.get("xs").type_name == "Widget"

    def test_js_new_expression(self, world):
        registry, imports, _, parser = world
        engine = TypeInferenceEngine(registry, imports)
        src = "function go() { const svc = new UserService(cfg); svc.create(); }\n"
        parsed = parser.parse_content(src, Language.JAVASCRIPT, "web/m.js")
        vmap = engine.infer_function_types(parsed.functions[0], "web.m",
                                           Language.JAVASCRIPT)
        assert vmap.get("svc").type_name == "UserService"

    def test_loop_element_type(self, world):
        registry, imports, _, parser = world
        engine = TypeInferenceEngine(registry, imports)
        src = (
            "def go(users: List[User]):\n"
            "    for u in users:\n"
            "        u.save()\n"
        )
        parsed = parser.parse_content(src, Language.PYTHON, "app/m.py")
        vmap = engine.infer_function_types(parsed.functions[0], "app.m",
                                           Language.PYTHON)
        assert vmap.get("u").type_name == "User"
        assert vmap.get("u").source == TypeSource.LOOP_ELEMENT


class TestExternalResolution:
    @pytest.fixture
    def proc(self, world):
        registry, imports, inheritance, parser = world
        parsed = parser.parse_content(
            "import asyncio\nimport json\n"
            "from pathlib import Path\n"
            "from rich.console import Console\n",
            Language.PYTHON, "app/api/routes.py")
        imports.parse_imports(parsed)
        from lattice_tpu.parsing.type_inference.engine import TypeInferenceEngine
        return CallProcessor(registry, imports, inheritance,
                             TypeInferenceEngine(registry, imports)), parser

    def _caller(self, parser, src="def go():\n    pass\n"):
        return parser.parse_content(src, Language.PYTHON,
                                    "app/api/routes.py").all_entities[-1]

    def test_imported_external_class(self, proc):
        p, parser = proc
        r = p.resolve_call("Path", self._caller(parser), "app.api.routes",
                           Language.PYTHON)
        assert r.resolution == "external"
        assert r.target_qn == "ext.pathlib.Path"

    def test_third_party_import(self, proc):
        p, parser = proc
        r = p.resolve_call("Console", self._caller(parser), "app.api.routes",
                           Language.PYTHON)
        assert r.resolution == "external"

    def test_stdlib_dotted(self, proc):
        p, parser = proc
        r = p.resolve_call("asyncio.gather", self._caller(parser),
                           "app.api.routes", Language.PYTHON)
        assert r.resolution == "external"

    def test_builtin_exception(self, proc):
        p, parser = proc
        r = p.resolve_call("ValueError", self._caller(parser),
                           "app.api.routes", Language.PYTHON)
        assert r.target_qn == "builtins.ValueError"

    def test_logger_convention(self, proc):
        p, parser = proc
        r = p.resolve_call("logger.warning", self._caller(parser),
                           "app.api.routes", Language.PYTHON)
        assert r.resolution == "external"

    def test_common_method_no_false_fuzzy(self, proc):
        p, parser = proc
        r = p.resolve_call("entities.append", self._caller(parser),
                           "app.api.routes", Language.PYTHON)
        assert r.target_qn == "builtins.append"
        assert r.resolution == "builtin"

    def test_local_import_still_links(self, proc, world):
        registry, imports, _, parser = world
        parsed = parser.parse_content(
            "from app.utils.helpers import format_name\n",
            Language.PYTHON, "app/api/routes.py")
        imports.parse_imports(parsed)
        p, _ = proc
        r = p.resolve_call("format_name", self._caller(parser),
                           "app.api.routes", Language.PYTHON)
        assert r.target_qn == "app.utils.helpers.format_name"
        assert r.resolution == "import"
