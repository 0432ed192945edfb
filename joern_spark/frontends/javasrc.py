"""Java frontend: recursive-descent parser emitting Joern-style CPG nodes.

Reproduces the reference javasrc2cpg *conventions* (not its code — the
reference wraps JavaParser in Scala):

* method fullname ``package.Class.method:returnType(paramTypes)`` —
  javasrc2cpg/src/main/scala/io/joern/javasrc2cpg/util/Util.scala:15-17
* constructors named ``<init>`` (x2cpg/.../Defines.scala:25-28)
* unresolved calls get ``<unresolvedNamespace>.name:<unresolvedSignature>(n)``
  (x2cpg/.../Defines.scala:11-22)
* ``class A extends B implements C`` → TYPE_DECL.inheritsFromTypeFullName
  (consumed by TypeHierarchyPass.scala:14-31 → INHERITS_FROM triples)
* member access lowers to ``<operator>.fieldAccess`` CALLs
  (FieldAccessLinkerPass.scala:23-34 links them to MEMBERs)
* Java conditions are boolean — NO implicit ``!= 0`` wrap (that is c2cpg-only,
  AstForStatementsCreator.scala:560-591)

Implementation note: subclasses the C/C++ recursive-descent machinery in
``clike.py`` (statements, precedence-climbing expressions) and overrides the
Java-divergent surface: top level (package/import/annotations), class bodies
(modifiers, fields, constructors), generics-aware type parsing, foreach,
try/finally, instanceof, ``new``, lambdas, and the fullname/signature scheme.
"""

from __future__ import annotations

from joern_spark import model as M
from joern_spark.frontends.astnode import N
from joern_spark.frontends.clike import CParser, ParseError, Tok

JAVA_KEYWORDS = frozenset(
    """abstract assert boolean break byte case catch char class const continue
    default do double else enum extends final finally float for goto if
    implements import instanceof int interface long native new package
    private protected public return short static strictfp super switch
    synchronized this throw throws transient try void volatile while
    record sealed permits true false null""".split()
)
# NB: contextual keywords (var, yield) stay identifiers — `int var` is legal.

JAVA_TYPE_KEYWORDS = frozenset(
    "boolean byte char short int long float double void".split()
)

# bare primitives pass BY_VALUE; everything else (incl. arrays) BY_SHARING
# (javasrc2cpg AstForMethodsCreator.scala:361)
JAVA_PRIMITIVES = frozenset(
    "boolean byte char short int long float double".split()
)

MODIFIERS = frozenset(
    """public private protected static final abstract native synchronized
    transient volatile strictfp sealed default""".split()
)

# common java.util types resolvable under `import java.util.*;` — the
# reference resolves these through the JDK type solver
# (MethodParameterTests.scala:153-165 List<String> -> java.util.List)
JAVA_UTIL = frozenset(
    """List Map Set ArrayList HashMap HashSet LinkedList LinkedHashMap
    Iterator Collection Collections Arrays Optional Queue Deque ArrayDeque
    TreeMap TreeSet Stack Vector Objects Comparator Scanner Random
    UUID Date Calendar""".split()
)

# Minimal JDK method-signature table — the reference resolves these through
# JavaParser's reflection type solver against the real JDK (CallTests.scala
# "calls to imported methods"); entries limited to methods its tests assert.
# (class fullname, method name) -> overload list like class_methods values.
JDK_METHODS: dict[tuple[str, str], list[tuple[str, bool, list[str]]]] = {
    ("java.lang.String", "valueOf"): [
        ("java.lang.String.valueOf:java.lang.String(boolean)", True,
         ["boolean"]),
        ("java.lang.String.valueOf:java.lang.String(int)", True, ["int"]),
        ("java.lang.String.valueOf:java.lang.String(long)", True, ["long"]),
        ("java.lang.String.valueOf:java.lang.String(char)", True, ["char"]),
        ("java.lang.String.valueOf:java.lang.String(java.lang.Object)",
         True, ["java.lang.Object"]),
    ],
    ("java.lang.String", "length"): [
        ("java.lang.String.length:int()", False, [])],
    ("java.lang.String", "equals"): [
        ("java.lang.String.equals:boolean(java.lang.Object)", False,
         ["java.lang.Object"])],
    ("java.lang.String", "substring"): [
        ("java.lang.String.substring:java.lang.String(int)", False, ["int"]),
        ("java.lang.String.substring:java.lang.String(int,int)", False,
         ["int", "int"])],
    ("java.lang.String", "charAt"): [
        ("java.lang.String.charAt:char(int)", False, ["int"])],
    ("java.lang.String", "toString"): [
        ("java.lang.String.toString:java.lang.String()", False, [])],
    ("java.lang.String", "isEmpty"): [
        ("java.lang.String.isEmpty:boolean()", False, [])],
    # java.util signatures asserted by CallTests "calls to imported methods"
    ("java.util.Base64", "getDecoder"): [
        ("java.util.Base64.getDecoder:java.util.Base64$Decoder()", True,
         [])],
    ("java.util.Base64$Decoder", "decode"): [
        ("java.util.Base64$Decoder.decode:byte[](java.lang.String)", False,
         ["java.lang.String"])],
    ("java.util.function.Function", "apply"): [
        ("java.util.function.Function.apply:java.lang.Object"
         "(java.lang.Object)", False, ["java.lang.Object"])],
    ("java.util.function.Supplier", "get"): [
        ("java.util.function.Supplier.get:java.lang.Object()", False, [])],
    # List.sort(Comparator) target-types multi-abstract-method lambdas
    # (NewTypeTests "lambda method implementing multi-abstract-method
    # interface", TypeTests.scala:118-130)
    ("java.util.ArrayList", "sort"): [
        ("java.util.ArrayList.sort:void(java.util.Comparator)", False,
         ["java.util.Comparator"])],
    ("java.util.List", "sort"): [
        ("java.util.List.sort:void(java.util.Comparator)", False,
         ["java.util.Comparator"])],
}

# generic JDK functional types: class type-parameters plus each method's
# (return-var, param-vars) — the call-site expression type substitutes the
# receiver's DECLARED type arguments while the methodFullName stays erased
# (CallTests "call to method with generic return type": supplier.apply
# evalType java.lang.Integer, mfn ...apply:java.lang.Object(...))
JDK_GENERIC: dict[tuple[str, str], tuple[list[str], str]] = {
    ("java.util.function.Function", "apply"): (["T", "R"], "R"),
    ("java.util.function.Supplier", "get"): (["T"], "T"),
}

# JDK functional interfaces: type-params, abstract method, return
# type-var (or concrete type), parameter type-vars. A lambda adopts its
# target interface's substituted method signature
# (AstForLambdasCreator.scala; LambdaTests "<lambda>0:java.lang.String
# (java.lang.String)")
FUNCTIONAL_IFACES: dict[str, tuple[list[str], str, str, list[str]]] = {
    "java.util.function.Function": (["T", "R"], "apply", "R", ["T"]),
    "java.util.function.Supplier": (["T"], "get", "T", []),
    "java.util.function.Consumer": (["T"], "accept", "void", ["T"]),
    "java.util.function.BiConsumer": (["T", "U"], "accept", "void",
                                      ["T", "U"]),
    "java.util.function.BiFunction": (["T", "U", "R"], "apply", "R",
                                      ["T", "U"]),
    "java.util.function.Predicate": (["T"], "test", "boolean", ["T"]),
    "java.util.function.UnaryOperator": (["T"], "apply", "T", ["T"]),
    "java.util.function.BinaryOperator": (["T"], "apply", "T", ["T", "T"]),
    "java.lang.Runnable": ([], "run", "void", []),
    "java.util.concurrent.Callable": (["V"], "call", "V", []),
    # Comparator counts: its single abstract method is compare(T,T)->int
    # (the other declared methods are default/static), so lambdas targeting
    # it adopt int(Object,Object) when unparameterized (TypeTests:118-130)
    "java.util.Comparator": (["T"], "compare", "int", ["T", "T"]),
}

# java.lang implicit imports — resolved like javasrc2cpg's TypeInfoCalculator
JAVA_LANG = {
    n: f"java.lang.{n}"
    for n in """String Object Integer Long Double Float Boolean Byte Short
    Character Math System Thread Runnable Exception RuntimeException Error
    Throwable StringBuilder StringBuffer Class Iterable Comparable Number
    Void CharSequence IllegalArgumentException IllegalStateException
    NullPointerException IndexOutOfBoundsException
    UnsupportedOperationException""".split()
}


def _clone_ast(n: N, remap: dict | None = None) -> N:
    """Deep-copy an expression tree (member initializers are replicated into
    every constructor; node identity must be unique per METHOD). ref_target
    stays shared — it points at declaration nodes, resolved at flatten —
    unless `remap` (id(old) -> new) redirects it (pattern locals hoisted
    per-constructor must not be shared across METHODs)."""
    c = N(n.kind, code=n.code, name=n.name, line=n.line)
    for slot in N.__slots__:
        if slot in ("children", "idx", "kind", "code", "name", "line"):
            continue
        setattr(c, slot, getattr(n, slot))
    if remap and c.ref_target is not None:
        c.ref_target = remap.get(id(c.ref_target), c.ref_target)
    c.children = [_clone_ast(ch, remap) for ch in n.children]
    return c


class JavaParser(CParser):
    KEYWORD_SET = JAVA_KEYWORDS
    STMT_TYPE_KEYWORDS = JAVA_TYPE_KEYWORDS
    # Java subscripts are <operator>.indexAccess, not the C
    # indirectIndexAccess (ArrayTests.scala:115-116)
    SUBSCRIPT_OP = M.OP_INDEX_ACCESS
    TRACK_PATTERN_SETS = True
    BOOL_OP_TY = "boolean"  # ==/</&&/... produce boolean in Java
    ARROW_MEMBER = False  # `->` ends a switch label / starts a lambda body

    _NO_SPACE_BEFORE = frozenset((".", ",", ";", ")", "]", "++", "--",
                                  "...", "::"))
    _NO_SPACE_AFTER = frozenset((".", "(", "[", "!", "~", "::", "@"))

    # genericSignature scratch state (set by parse_java_type /
    # _parse_type_params; consumed by the declaration sites)
    last_raw_type = ""
    last_tparams_sig = ""
    _pending_tparams_sig = ""
    _pending_ret_raw = ""
    _twr_prelude: list = []

    def slice(self, a, b) -> str:
        """Expression code spelling. Multi-line or comment-bearing spans are
        re-rendered from tokens the way JavaParser's printer would —
        comments dropped, single-spaced — so `new Foo()\\n // c\\n
        .getValue()` spells "new Foo().getValue()" (CallTests "code
        fields" :402-496). Single-line spans keep the raw source."""
        s = self.src[a.a:b.b].strip()
        if "\n" not in s and "//" not in s and "/*" not in s:
            return s
        from bisect import bisect_left
        starts = getattr(self, "_tok_starts", None)
        if starts is None:
            starts = self._tok_starts = [t.a for t in self.toks]
        i0 = bisect_left(starts, a.a)
        i1 = bisect_left(starts, b.a)
        out: list[str] = []
        prev = None
        for t in self.toks[i0:i1 + 1]:
            v = t.v
            if out and v not in self._NO_SPACE_BEFORE \
                    and prev not in self._NO_SPACE_AFTER \
                    and not (v in ("(", "[")
                             and prev is not None
                             and (prev[-1].isalnum()
                                  or prev[-1] in "_\"')]")):
                out.append(" ")
            out.append(v)
            prev = v
        return "".join(out)

    def declare(self, name: str, node: N):
        # record the innermost enclosing method for local-class capture
        # scoping (LocalClassTests nested-context rule)
        self.decl_method[id(node)] = self.method_ctx[-1] if self.method_ctx else ""
        super().declare(name, node)

    def lower_field_access(self, call: "N") -> "N":
        """`xs.length` on an array-typed base -> <operator>.sizeOf with the
        base as its only argument (ArrayTests.scala:146-158)."""
        if call.name == M.OP_FIELD_ACCESS and len(call.children) == 2:
            base, fld = call.children
            if fld.kind == M.FIELD_IDENTIFIER and fld.name == "length" \
                    and (base.type_full_name or "").endswith("[]"):
                size = N(M.CALL, code=call.code, name=M.OP_SIZEOF,
                         method_full_name=M.OP_SIZEOF,
                         dispatch_type=M.STATIC_DISPATCH, line=call.line,
                         type_full_name="int")
                base.arg_index = 1
                size.add(base)
                return size
            if fld.kind == M.FIELD_IDENTIFIER \
                    and (not call.type_full_name
                         or call.type_full_name == M.ANY) \
                    and base.kind == M.IDENTIFIER \
                    and base.name == "this":
                # `this.x` adopts the member's declared type so chained
                # member calls resolve (CallTests "call to method in
                # derived class": this.sessionFactory.getCurrentSession())
                d = self.lookup(fld.name)
                if d is not None and d.kind == M.MEMBER \
                        and d.type_full_name:
                    call.type_full_name = d.type_full_name
                elif self.class_ctx:
                    # record components become MEMBERs only after the body
                    # parses, so `this.value` in an explicit record ctor
                    # adopts the component's declared type directly
                    # (RecordTests.scala:144-215 valueAssign typeFullName)
                    for _rty, ty, nm2, _ln in self.record_components.get(
                            self.class_ctx[-1], []):
                        if nm2 == fld.name and ty:
                            call.type_full_name = ty
                            break
        return call

    def make_literal(self, t) -> "N | None":
        """Java literal typing (LiteralTests.scala expectedOutput +
        TypeInfoCalculator): numeric suffixes f/F -> float, d/D or
        decimal-point/exponent -> double, l/L -> long; strings ->
        java.lang.String; true/false -> boolean; null -> Literal("null")."""
        if t.t == "num":
            v = t.v.lower()
            if v.startswith(("0x", "0b")):
                ty = "long" if v.endswith("l") else "int"
            elif v.endswith("f"):
                ty = "float"
            elif v.endswith("d") or "." in v or "e" in v:
                ty = "double"
            elif v.endswith("l"):
                ty = "long"
            else:
                ty = "int"
            return N(M.LITERAL, code=t.v, line=t.line, type_full_name=ty)
        if t.t == "str":
            return N(M.LITERAL, code=t.v, line=t.line,
                     type_full_name="java.lang.String")
        if t.t == "char":
            return N(M.LITERAL, code=t.v, line=t.line, type_full_name="char")
        if t.v in ("true", "false"):
            return N(M.LITERAL, code=t.v, line=t.line,
                     type_full_name="boolean")
        if t.v == "null":
            return N(M.LITERAL, code="null", line=t.line,
                     type_full_name="null")
        return None

    def method_ref_expr(self, t) -> "N | None":
        """`Base::method` / `recv::method` / `Type::new` -> METHOD_REF
        (MethodRefTests.scala): methodFullName resolved through the scope
        type or class table (unresolved signature WITHOUT arity when only
        the type is known — :37-60; <unresolvedNamespace> when nothing is
        — :63-79); typeFullName = the receiver/class fullname."""
        self.next()  # ::
        mtok = self.next()
        mname = M.CONSTRUCTOR if mtok.v == "new" else mtok.v
        code = f"{t.v}::{mtok.v}"
        decl = self.lookup(t.v)
        ty = (self.resolve_type(decl.type_full_name) if decl is not None
              else self.unresolved_ident_type(t.v))
        entries = None
        if ty and ty != M.ANY:
            seen: set[str] = set()
            stack = [ty]
            while stack:
                c = stack.pop(0)
                if not c or c in seen:
                    continue
                seen.add(c)
                entries = (self.class_methods.get(c, {}).get(mname)
                           or JDK_METHODS.get((c, mname)))
                if entries:
                    break
                stack.extend(self.class_supers.get(c, []))
        if entries:
            sig = entries[0][0].rsplit(":", 1)[1]
            mfn, node_ty = f"{ty}.{mname}:{sig}", ty
        elif ty and ty != M.ANY:
            mfn, node_ty = f"{ty}.{mname}:{M.UNRESOLVED_SIGNATURE}", ty
        else:
            mfn = f"{M.UNRESOLVED_NAMESPACE}.{mname}:{M.UNRESOLVED_SIGNATURE}"
            node_ty = M.ANY
        return N(M.METHOD_REF, code=code, name=code, line=t.line,
                 method_full_name=mfn, type_full_name=node_ty)

    def identifier_expr(self, node: N) -> N:
        """Bare member reads wrap into an implicit-base fieldAccess
        (AstForNameExpressionsCreator.createImplicitBaseFieldAccess):
        instance members -> `this.<field>` with the `this` identifier
        REF-ing the enclosing this parameter; static members -> a TYPE_REF
        base named after the enclosing class."""
        if node.name == "super" and self.at("."):
            # `super.m()` receiver: an Identifier NAMED `this` with code
            # "super", typed as the direct superclass (java.lang.Object
            # default), REF-ing the enclosing this parameter (CallTests
            # "call to super method" :560-569, "explicit super scope"
            # :25-30)
            node.name = "this"
            node.code = "super"
            this_decl = self.lookup("this")
            if this_decl is not None:
                node.ref_target = this_decl
                sups = self.class_supers.get(this_decl.type_full_name, [])
                node.type_full_name = sups[0] if sups else "java.lang.Object"
            else:
                node.type_full_name = "java.lang.Object"
            return node
        d = node.ref_target
        if d is not None and d.kind == M.LOCAL and d.name != node.name \
                and d.name.startswith(f"{node.name}$"):
            # the binding resolved to a pattern-mangled local (`value$0`);
            # identifiers carry the mangled name (PatternExprTests
            # "locals with mangled names")
            node.name = node.code = d.name
            return node
        if d is None or d.kind != M.MEMBER:
            return node
        fname = node.name
        if id(d) in self.static_member_ids:
            cls_full = d.ast_parent_full_name or ""
            cls_name = cls_full.split(".")[-1] if cls_full else ""
            base = N(M.TYPE_REF, code=cls_name, type_full_name=cls_full,
                     line=node.line)
            code = f"{cls_name}.{fname}"
        else:
            this_decl = self._this_for_member(d)
            if this_decl is None:
                return node
            base = N(M.IDENTIFIER, code="this", name="this", line=node.line,
                     type_full_name=this_decl.type_full_name)
            base.ref_target = this_decl
            code = f"this.{fname}"
        fa = N(M.CALL, code=code, name=M.OP_FIELD_ACCESS,
               method_full_name=M.OP_FIELD_ACCESS,
               dispatch_type=M.STATIC_DISPATCH, line=node.line,
               type_full_name=node.type_full_name)
        base.arg_index = 1
        fld = N(M.FIELD_IDENTIFIER, code=fname, name=fname,
                canonical_name=fname, line=node.line)
        fld.arg_index = 2
        fa.add(base)
        fa.add(fld)
        fa.ref_target = d  # fieldAccess REF -> MEMBER (FieldAccessLinkerPass)
        return fa

    def _this_for_member(self, member: N) -> N | None:
        """The `this` binding whose class (or one of its transitive supers)
        OWNS the member — an outer field accessed from an anonymous-class
        initializer binds the OUTER this, not the anon's (CapturingTests
        "instance initializer accessing outer field")."""
        owner = member.ast_parent_full_name or ""
        fallback = None
        for s in reversed(self.scopes):
            t = s.get("this")
            if t is None:
                continue
            if fallback is None:
                fallback = t
            cls, seen = t.type_full_name, set()
            stack = [cls]
            while stack:
                c = stack.pop()
                if c in seen:
                    continue
                seen.add(c)
                if c == owner:
                    return t
                stack.extend(self.class_supers.get(c, []))
        return fallback

    def note_init_dynamic_type(self, decl: "N", init: "N") -> None:
        if init.kind == M.CALL and init.name == M.CONSTRUCTOR \
                and init.type_full_name not in ("", M.ANY):
            self.dyn_ty[id(decl)] = init.type_full_name
        if init.kind == M.CALL \
                and init.type_full_name in ("", M.ANY, None) \
                and decl.type_full_name not in ("", M.ANY, None):
            # an unresolved call adopts the assignment target's declared
            # type (TypeInferenceTests "methodFullName for unresolved call
            # in assignment": int x = b.bar() -> call typed int)
            init.type_full_name = decl.type_full_name

    def unresolved_ident_type(self, name: str) -> str:
        """A bare identifier with no local/param/field in scope that names a
        known class IS that class (static member access receiver,
        FieldAccessTests.scala:46-52 `Foo.MAX_VALUE` -> identifier Foo
        typed Foo; JavaParser's symbol solving)."""
        if name in self.declared_types:
            return self.declared_types[name]
        if name in self.imports:
            return self.imports[name]
        if name in JAVA_LANG:
            return JAVA_LANG[name]
        if self.star_java_util and name in JAVA_UTIL:
            return f"java.util.{name}"
        return M.ANY

    def __init__(self, content: str, path: str):
        super().__init__(content, path, "java")
        self.package = ""
        self.imports: dict[str, str] = {}  # simple name -> fqn
        self.star_java_util = False      # `import java.util.*;` seen
        self.unknown_star_import = False  # non-JDK wildcard import seen
        self.star_packages: list[str] = []  # non-JDK wildcard packages
        self.lambda_counter = 0
        # methods declared per class fullname: name -> overload list of
        # (fullname, is_static, param_types) — JLS-lite selection by arg
        # count/types (CallTests "static methods in different files")
        self.class_methods: dict[str, dict[str, list[tuple[str, bool, list[str]]]]] = {}
        # fullnames declared with `...` — call sites pack the trailing
        # arguments into <operator>.arrayInitializer (TypeTests.scala
        # "use an arrayInitializer call node to represent varargs")
        self.varargs_methods: set[str] = set()
        # MEMBER nodes declared static — their bare reads wrap with a
        # TYPE_REF base instead of `this` (identifier_expr)
        self.static_member_ids: set[int] = set()
        # class fullname -> resolved supertype fullnames (for unqualified /
        # receiver-typed call resolution up the hierarchy,
        # CallTests "call to method in different class")
        self.class_supers: dict[str, list[str]] = {}
        # non-static field initializers per class fullname:
        # (field name, type, init expr, line) — folded into constructors
        self.member_inits: dict[str, list[tuple[str, str, N, int, list[N]]]] = {}
        # static field initializers per class fullname: (field name, raw
        # declared type spelling, init expr, line) — synthesized into one
        # `<clinit>` method per class (AstForMethodsCreator.scala:218-226
        # clinitAstFromStaticInits; NewObjectTests.scala flow sources)
        self.static_inits: dict[str, list[tuple[str, str, N, int, list[N]]]] = {}
        # foreach lowering temporaries (`$iterLocalN` / `$idxN`,
        # ControlStructureTests.scala:169-640)
        self.iterlocal_counter = 0
        self.idx_counter = 0
        # generic type-parameter scopes: class/method `<T extends B>` lists
        # mapped to their ERASURE (JavaParser symbol-solver behavior asserted
        # in GenericsTests.scala:182-263, MethodParameterTests.scala:52-137)
        self.tparam_env: list[dict[str, str]] = []
        # class fullname -> [(resolved super fullname, [raw type-arg texts])]
        # for supertypes written with type arguments — feeds the BINDING
        # erasure variants (BindingTests.scala:7-77)
        self.generic_supers: dict[str, list[tuple[str, list[str]]]] = {}
        # record components per class fullname: [(raw type, resolved type,
        # name, line)] (RecordTests.scala:10-131)
        self.record_components: dict[str, list[tuple[str, str, str, int]]] = {}
        # raw header type texts (generic args kept) for genericSignatures
        self.record_component_raws: dict[str, list[str]] = {}
        # local-class fullname -> [(capture name or "this", type)] in ctor
        # param order — appended to `new Local(...)` call sites
        self.local_class_captures: dict[str, list[tuple[str, str]]] = {}
        # stack of enclosing class FULLNAMES (incl. anonymous/local classes,
        # whose ns-derived spellings would be wrong)
        self.class_ctx: list[str] = []
        # innermost enclosing method fullname per declaration — local
        # classes capture ONLY the immediately-enclosing method's variables
        # (LocalClassTests "local classes in a nested static context":
        # Baz captures barLocal/barParam but NOT foo's, which flow through
        # Bar's members via outerClass instead)
        self.method_ctx: list[str] = []
        self.decl_method: dict[int, str] = {}
        self.compact_ctor_classes: set[str] = set()
        # anonymous-class naming context (AnonymousClassTests.scala): a
        # stack of (context prefix, enclosing class fullname, is_static) —
        # the prefix is the enclosing method's `Class.method`, a field
        # initializer's `Class.field`, or a lambda's fullname; anon decls
        # become `{prefix}.{Super}$N` with N counted per prefix
        self.anon_ctx: list[tuple[str, str, bool]] = []
        self.anon_counts: dict[str, int] = {}
        # declaration node id -> constructed (dynamic) type: locals/members
        # initialized with `new X(...)` resolve receiver calls through X
        # first (AnonymousClassTests: `b.bar()` on an anonymous-class value
        # names `foo.Foo.foo.Bar$0.bar:void()`)
        self.dyn_ty: dict[int, str] = {}
        # LOCALs for instanceof binding patterns outside any method frame
        # (field initializers), hoisted by the enclosing parse_statement
        self.pending_pattern_locals: list[N] = []
        # -------- Java 16+ pattern matching (PatternExprTests.scala;
        # AstForPatternExpressionsCreator.scala) --------
        # one frame per method body being parsed: hoisted pattern locals
        # land at the START of the method body (testStandardPatternLocal-
        # Lowering); `by_key` reuses a local for a repeated (name, type)
        # pattern; `names` drives `$K` mangling of clashing vardecls
        # (Scope.scala:334-341, JavaScopeElement.scala:171)
        self.pattern_frames: list[dict] = []
        # per-file $objN temp counter (AstCreator.scala:86 tempNameProvider)
        self.temp_obj_n = 0
        # declaration-site generic type arguments, id(decl) -> raw texts
        # (JDK_GENERIC call-site substitution)
        self.decl_targs: dict[int, list[str]] = {}
        self.last_type_args: list[str] | None = None
        # method fullname -> per-parameter declared type args (prescan);
        # drives lambda target-typing at call sites
        self.method_param_targs: dict[str, list] = {}
        # (return type, return type args) of the method being parsed —
        # `return <lambda>` target-typing
        self.method_ret_ctx: list[tuple[str, list | None]] = []
        # id(expr N) -> (introduced-when-true, introduced-when-false) maps
        # of source-name -> LOCAL, the JLS 6.3 flow-scope sets; propagated
        # through !/&&/|| so control structures can decide which pattern
        # bindings outlive the statement (AstForStatementsCreator.scala:
        # 86-121 partitionPatternAstsByScope)
        self.expr_patterns: dict[int, tuple[dict, dict]] = {}
        # live eager scope declarations for pattern variables:
        # (scope dict, name, previous binding, existed, LOCAL)
        self.pattern_binds: list[tuple] = []
        # pattern_binds marks of the control statements currently parsing —
        # body_scope_enter hides only the CURRENT statement's bindings
        self._cs_marks: list[int] = []
        # hoisted pattern locals per OPEN block, (name, type) -> LOCAL
        # (BlockScope.hoistedPatternLocals); drives `$K` vardecl mangling
        # and same-(name, type) local sharing
        self.block_pattern_names: list[dict] = []
        # parse_statement nesting depth — capture frames (switch entries,
        # expression-bodied lambdas) only catch locals hoisted at their own
        # depth; deeper ones drain before their own statement
        self._stmt_depth = 0
        self._switch_expr_pos = False

    # ---------------- naming ----------------
    def resolve_type(self, name: str) -> str:
        if not name:
            return M.ANY
        base = name.rstrip("[]*")
        suffix = name[len(base):].replace("*", "[]")
        # generic type parameters erase first, innermost scope wins
        # (GenericsTests.scala:188-204: T -> java.lang.Object; :230-249
        # bounded T -> its first bound)
        for env in reversed(self.tparam_env):
            if base in env:
                return env[base] + suffix
        if base in self.declared_types:
            return self.declared_types[base] + suffix
        if base in self.imports:
            return self.imports[base] + suffix
        if "." in base:
            # qualified nested-class spelling `Outer.Foo` -> the declared
            # `foo.Outer$Foo` (CallTests "a static call to a nested
            # inherited method")
            head, rest = base.split(".", 1)
            if head in self.declared_types:
                cand = (self.declared_types[head] + "$"
                        + rest.replace(".", "$"))
                if cand in self.class_methods:
                    return cand + suffix
            if head in self.imports:
                # a dotted name whose head is an imported CLASS is a nested
                # class — `$`-joined binary naming (CallTests
                # `Base64.Decoder` -> java.util.Base64$Decoder)
                return (self.imports[head] + "$" + rest.replace(".", "$")
                        + suffix)
        if base in JAVA_LANG:
            return JAVA_LANG[base] + suffix
        if self.star_java_util and base in JAVA_UTIL:
            return f"java.util.{base}{suffix}"
        # a simple class-like name that could only come from an unresolvable
        # wildcard import -> <unresolvedNamespace> prefix
        # (GenericsTests.scala:89-96 `import a.*; Bar<Integer>` ->
        # <unresolvedNamespace>.Bar)
        if (self.unknown_star_import and "." not in base
                and base[:1].isupper() and base != M.ANY
                and base not in JAVA_TYPE_KEYWORDS):
            # a SINGLE wildcard import is unambiguous: the name resolves
            # into that package (TypeInferenceTests "typeFullName for
            # unresolved param from single wildcard import" -> d.Baz);
            # multiple candidates stay <unresolvedNamespace>
            # (GenericsTests:77-98 `import a.*; import b.*`)
            if len(self.star_packages) == 1:
                return f"{self.star_packages[0]}.{base}{suffix}"
            return f"{M.UNRESOLVED_NAMESPACE}.{base}{suffix}"
        return name.replace("*", "[]")

    # ---------------- JVM-style generic signatures --------------------------
    # (GenericSignatureTests.scala semantics: declared SOURCE types, simple
    #  names; qualified source names verbatim; type variables `TX;`;
    #  `L__unspecified_type;` for var/lambda/unknown)

    _PRIM_SIG = {"byte": "B", "char": "C", "double": "D", "float": "F",
                 "int": "I", "long": "J", "short": "S", "boolean": "Z",
                 "void": "V"}
    UNSPEC_SIG = "L__unspecified_type;"

    def _tvar_names(self) -> set:
        s: set[str] = set()
        for env in self.tparam_env:
            s.update(env)
        return s

    def _sig_base_name(self, name: str) -> str:
        """Class-name spelling inside `L...;`: dotted source names verbatim;
        names resolving to a LOCAL class use its CPG fullName
        (`Test.test:void().Foo`); nested classes their `$`-joined CPG name
        (`Test$Foo`); everything else the simple source name."""
        if "." in name:
            return name
        fn = self.declared_types.get(name)
        if fn:
            if ":" in fn:  # local class (method-scoped fullname)
                return fn
            local = fn[len(self.package) + 1:] \
                if self.package and fn.startswith(self.package + ".") else fn
            if "$" in local:
                return local
        return name

    def sig_of_raw(self, raw: str, tvars: set | None = None) -> str:
        """Raw declared-type source text -> JVM generic signature."""
        raw = (raw or "").strip()
        if not raw or raw == "var":
            return self.UNSPEC_SIG
        tvars = self._tvar_names() if tvars is None else tvars
        sig, _ = self._sig_parse(raw, 0, tvars)
        return sig or self.UNSPEC_SIG

    def _sig_parse(self, s: str, i: int, tvars: set) -> tuple[str, int]:
        n = len(s)
        while i < n and s[i].isspace():
            i += 1
        if i < n and s[i] == "@":  # annotation in type position — skip name
            i += 1
            while i < n and (s[i].isalnum() or s[i] in "_$."):
                i += 1
            return self._sig_parse(s, i, tvars)
        if i < n and s[i] == "?":
            i += 1
            while i < n and s[i].isspace():
                i += 1
            if s.startswith("extends", i):
                inner, i = self._sig_parse(s, i + 7, tvars)
                return "+" + inner, i
            if s.startswith("super", i):
                inner, i = self._sig_parse(s, i + 5, tvars)
                return "-" + inner, i
            return "*", i
        j = i
        while j < n and (s[j].isalnum() or s[j] in "_$."):
            j += 1
        name = s[i:j]
        i = j
        while i < n and s[i].isspace():
            i += 1
        args = ""
        if i < n and s[i] == "<":
            i += 1
            parts: list[str] = []
            while i < n:
                while i < n and s[i].isspace():
                    i += 1
                if i < n and s[i] == ">":
                    i += 1
                    break
                part, i = self._sig_parse(s, i, tvars)
                parts.append(part)
                while i < n and s[i].isspace():
                    i += 1
                if i < n and s[i] == ",":
                    i += 1
                elif i < n and s[i] == ">":
                    i += 1
                    break
                else:
                    break
            args = "<" + "".join(parts) + ">"
        dims = 0
        while True:
            while i < n and s[i].isspace():
                i += 1
            if s.startswith("[]", i):
                dims += 1
                i += 2
            elif s.startswith("...", i):
                dims += 1
                i += 3
            else:
                break
        if not name:
            return "[" * dims + self.UNSPEC_SIG, i
        if name in self._PRIM_SIG and not args:
            core = self._PRIM_SIG[name]
        elif name in tvars and not args:
            core = f"T{name};"
        elif name == "var":
            core = self.UNSPEC_SIG
        else:
            core = f"L{self._sig_base_name(name)}{args};"
        return "[" * dims + core, i

    def tparams_sig(self, bounds: list) -> str:
        """[(name, [raw bound texts])] -> `<T:LObject;U:LB1;:LB2;>`; the
        unbounded class bound renders LObject; extra bounds join with `:`
        (empty-class-bound collapse per GenericSignatureTests doc note)."""
        if not bounds:
            return ""
        tvars = self._tvar_names() | {nm for nm, _ in bounds}
        out = ["<"]
        for nm, raws in bounds:
            if not raws:
                out.append(f"{nm}:LObject;")
            else:
                out.append(f"{nm}:" + ":".join(
                    self.sig_of_raw(r, tvars) for r in raws))
        out.append(">")
        return "".join(out)

    def _parse_type_params(self) -> dict[str, str]:
        """`<T, U extends Num & Cmp, V extends U>` -> {name: erased type}.

        Erasure rules (javasrc2cpg via JavaParser's resolved type params,
        asserted in GenericsTests.scala:188-263 and
        MethodParameterTests.scala:52-137): unbounded -> java.lang.Object;
        bounded -> FIRST bound (compound `A & B` keeps A); a bound that is
        itself a type parameter of the same list chases transitively."""
        self.expect("<")
        raw: dict[str, str | None] = {}
        order: list[str] = []
        bounds_raw: list[tuple[str, list[str]]] = []
        while self.peek() is not None and not self.at(">"):
            self.skip_annotations()
            t = self.peek()
            if t.t != "id":
                self.next()
                continue
            name = self.next().v
            bound = None
            braws: list[str] = []
            if self.at("extends"):
                self.next()
                bound = self.parse_java_type()
                braws.append(self.last_raw_type)
                while self.at("&"):
                    self.next()
                    self.parse_java_type()  # additional bounds erase away,
                    braws.append(self.last_raw_type)  # but sign the gensig
            raw[name] = bound
            order.append(name)
            bounds_raw.append((name, braws))
            if self.at(","):
                self.next()
        if self.at(">"):
            self.next()
        # `<T:LObject;U:LB1;:LB2;>` prefix for the owner's genericSignature
        self.last_tparams_sig = self.tparams_sig(bounds_raw)
        env: dict[str, str] = {}

        def erase(nm: str, seen: tuple = ()) -> str:
            b = raw.get(nm)
            if b is None:
                return "java.lang.Object"
            base = b.rstrip("[]")
            if base in raw and base not in seen:
                return erase(base, seen + (nm,))
            return self.resolve_type(b)

        for nm in order:
            env[nm] = erase(nm)
        return env

    def _parse_super_type(self) -> tuple[str, list[str]]:
        """One `extends`/`implements` entry -> (erased fullname, raw type-arg
        texts). Type arguments feed the BINDING erasure variants."""
        name = self.next().v
        while self.at(".") and self.peek(1) is not None and self.peek(1).t == "id":
            self.next()
            name += "." + self.next().v
        args: list[str] = []
        if self.at("<"):
            self.next()
            depth = 1
            start = self.peek()
            while self.peek() is not None and depth:
                t = self.next()
                if t.v == "<":
                    depth += 1
                elif t.v == ">":
                    depth -= 1
                    if depth == 0 and start is not None:
                        args.append(self.src[start.a:t.a].strip())
                elif t.v == ">>":
                    depth -= 2
                    if depth <= 0:
                        depth = 0
                        if start is not None:
                            args.append(self.src[start.a:t.a + 1].strip())
                elif t.v == "," and depth == 1 and start is not None:
                    args.append(self.src[start.a:t.a].strip())
                    start = self.peek()
        return self.resolve_type(name), [a for a in args if a]

    def qual(self, name: str) -> str:
        # nested types join with `$` per the reference's binary-name scheme
        # (TypeDeclTests.scala:408 "a.b.c.d.OuterClass$InnerInterface")
        nested = "$".join([p for p in self.ns if p] + [name])
        return f"{self.package}.{nested}" if self.package else nested

    # ---------------- type parsing (generics, arrays, varargs) -------------
    def parse_java_type(self) -> str:
        t = self.peek()
        if t is None:
            self.last_raw_type = ""
            return M.ANY
        if t.v == "?":  # wildcard
            self.next()
            if self.at_any(("extends", "super")):
                self.next()
                self.parse_java_type()
            self.last_raw_type = self.src[t.a:self.toks[self.pos - 1].b]
            return M.ANY
        name = self.next().v
        while self.at(".") and self.peek(1) is not None and self.peek(1).t == "id":
            self.next()
            name += "." + self.next().v
        self.last_type_args = None
        if self.at("<"):
            # record the raw type-argument texts before erasing — the
            # declaration site stashes them for call-site substitution
            # (JDK_GENERIC; CallTests "generic return type")
            a0 = self.peek(1)
            self.skip_balanced("<", ">")
            a1 = self.toks[self.pos - 1]
            if a0 is not None and a1.a > a0.a:
                inner = self.src[a0.a:a1.a].strip()
                if inner and "<" not in inner:
                    self.last_type_args = [x.strip()
                                           for x in inner.split(",")]
        dims = ""
        while self.at("[") and self.at("]", 1):
            self.next(); self.next()
            dims += "[]"
        # raw source span of the full type (generic args INCLUDED) — the
        # genericSignature input (GenericSignatureTests: signatures are
        # computed from declared source types, pre-erasure)
        self.last_raw_type = self.src[t.a:self.toks[self.pos - 1].b]
        return name + dims

    def looks_like_java_type(self) -> bool:
        t = self.peek()
        if t is None:
            return False
        if t.t == "kw" and t.v in JAVA_TYPE_KEYWORDS:
            return True
        if t.t != "id":
            return False
        # Ident [<...>] [[]...] Ident  — declaration shape
        k = 1
        while self.at(".", k) and self.peek(k + 1) is not None and self.peek(k + 1).t == "id":
            k += 2
        if self.at("<", k):
            depth = 0
            while self.peek(k) is not None:
                v = self.peek(k).v
                if v == "<":
                    depth += 1
                elif v == ">":
                    depth -= 1
                    if depth == 0:
                        k += 1
                        break
                elif v == ">>":  # closes two nested levels in one token
                    depth -= 2
                    if depth <= 0:
                        k += 1
                        break
                elif v == ";" or v == "{":
                    return False
                k += 1
        while self.at("[", k) and self.at("]", k + 1):
            k += 2
        nxt = self.peek(k)
        return nxt is not None and nxt.t == "id"

    def skip_annotations(self) -> list[N]:
        """Parse (not skip) `@Name`, `@Name(expr)`, `@Name(k = v, ...)` into
        ANNOTATION nodes and return them; parse_member/parse_type_decl
        attach them to the following METHOD/TYPE_DECL
        (AnnotationTests.scala). `@interface` (an annotation-type
        declaration) is left for parse_type_decl."""
        out: list[N] = []
        while self.at("@"):
            if self.peek(1) is not None and self.peek(1).v == "interface":
                self.next()  # parse_type_decl handles `interface Name {}`
                return out
            at_tok = self.next()
            if self.peek() is None or self.peek().t not in ("id", "kw"):
                continue
            parts = [self.next().v]
            while self.at(".") and self.peek(1) is not None:
                self.next()
                parts.append(self.next().v)
            name = parts[-1]
            dotted = ".".join(parts)
            full = (self.imports.get(name) or self.declared_types.get(name)
                    or JAVA_LANG.get(name)
                    or (dotted if len(parts) > 1
                        else self.resolve_type(name)))
            ann = N(M.ANNOTATION, name=name, full_name=full, line=at_tok.line)
            code = f"@{dotted}"
            if self.at("("):
                self.next()
                inner_parts: list[str] = []
                order = 1
                while self.peek() is not None and not self.at(")"):
                    # `k = v` pair or a bare value (implicit `value =`)
                    if (self.peek().t == "id" and self.peek(1) is not None
                            and self.peek(1).v == "="):
                        pname = self.next().v
                        self.next()  # =
                        vtok_start = self.peek()
                        val = self._annotation_value()
                        acode = f"{pname} = {val[0]}"
                        inner_parts.append(acode)
                    else:
                        pname = "value"
                        vtok_start = self.peek()
                        val = self._annotation_value()
                        acode = val[0]
                        inner_parts.append(acode)
                    assign = N(M.ANNOTATION_PARAMETER_ASSIGN, code=acode,
                               line=vtok_start.line if vtok_start else at_tok.line)
                    p = N(M.ANNOTATION_PARAMETER, code=pname,
                          line=assign.line)
                    v = N(M.ANNOTATION_LITERAL, code=val[1], name=val[1],
                          line=assign.line)
                    v.arg_index = 2
                    assign.add(p)
                    assign.add(v)
                    ann.add(assign)
                    order += 1
                    if self.at(","):
                        self.next()
                if self.at(")"):
                    self.next()
                code += f"({', '.join(inner_parts)})"
            ann.code = code
            out.append(ann)
        return out

    def _annotation_value(self) -> tuple[str, str]:
        """One annotation value expression -> (source code, display code
        with string quotes stripped like AnnotationLiteral.code)."""
        depth = 0
        toks: list[str] = []
        first = self.peek()
        while self.peek() is not None:
            t = self.peek()
            if depth == 0 and t.v in (",", ")"):
                break
            if t.v in ("(", "{"):
                depth += 1
            elif t.v in (")", "}"):
                depth -= 1
            toks.append(self.next().v)
        if first is not None and toks:
            last = self.toks[self.pos - 1]
            src = self.slice(first, last)
        else:
            src = " ".join(toks)
        if first is not None and first.t == "str" and len(toks) == 1:
            return src, src[1:-1]
        return src, src

    # ---------------- top level ----------------
    def _prescan_type_decls(self) -> None:
        """Register every type name declared anywhere in the file before
        parsing bodies, so forward references resolve (`class Bar extends
        Woo {} class Woo {}` → inheritsFrom a.b.c.d.Woo, the JavaParser
        symbol-solver behavior asserted at TypeDeclTests.scala:389).
        Tracks brace depth and the enclosing class-name stack so nested
        declarations register under their `Outer$Inner` binary name."""
        pkg = ""
        i = 0
        toks = self.toks
        # stack of (brace_depth_at_open, name) for enclosing type decls
        stack: list[tuple[int, str]] = []
        depth = 0
        pending: str | None = None  # type name seen, waiting for its `{`
        while i < len(toks):
            t = toks[i]
            v = t.v
            if v == "package" and t.t == "kw" and not pkg:
                parts = []
                i += 1
                while i < len(toks) and toks[i].v != ";":
                    if toks[i].t == "id":
                        parts.append(toks[i].v)
                    i += 1
                pkg = ".".join(parts)
                continue
            if t.t == "kw" and v in ("class", "interface", "enum", "record") \
                    and i + 1 < len(toks) and toks[i + 1].t == "id":
                pending = toks[i + 1].v
                i += 2
                continue
            if v == "{":
                if pending is not None:
                    stack.append((depth, pending))
                    nested = "$".join([n for _, n in stack])
                    full = f"{pkg}.{nested}" if pkg else nested
                    self.declared_types.setdefault(pending, full)
                    pending = None
                depth += 1
            elif v == "}":
                depth -= 1
                if stack and stack[-1][0] == depth:
                    stack.pop()
            elif v in (";", "=") :
                pending = None
            i += 1

    def parse(self) -> list[N]:
        self._prescan_type_decls()
        roots: list[N] = []
        self._pending_anns: list[N] = []
        while self.peek() is not None:
            t = self.peek()
            self._pending_anns += self.skip_annotations()
            if self.peek() is None:
                break
            t = self.peek()
            if t.v == "package":
                self.next()
                parts = [self.next().v]
                while self.at("."):
                    self.next()
                    parts.append(self.next().v)
                if self.at(";"):
                    self.next()
                self.package = ".".join(parts)
                # the file's NAMESPACE_BLOCK: name = the package, fullName
                # `{filename}:{package}`, order 1; type decls in this file
                # re-parent under it (NamespaceBlockTests.scala:19-36)
                self.global_block = f"{self.path}:{self.package}"
                roots.append(N(M.NAMESPACE_BLOCK,
                               code=f"package {self.package}",
                               name=self.package,
                               full_name=self.global_block, line=t.line))
                continue
            if t.v == "import":
                line = t.line
                self.next()
                is_static = False
                if self.at("static"):
                    self.next()
                    is_static = True
                parts = [self.next().v]
                star = False
                while self.at("."):
                    self.next()
                    if self.at("*"):
                        self.next()
                        star = True
                        break
                    parts.append(self.next().v)
                if self.at(";"):
                    self.next()
                entity = ".".join(parts)
                if not star and parts:
                    self.imports[parts[-1]] = entity
                elif star:
                    if entity == "java.util":
                        self.star_java_util = True
                    else:
                        self.unknown_star_import = True
                        self.star_packages.append(entity)
                # IMPORT node per declaration (ImportTests.scala:26-36):
                # importedEntity = the dotted path, importedAs = the simple
                # name ("*" for on-demand imports), code without semicolon
                imported_as = "*" if star else parts[-1]
                code = ("import " + ("static " if is_static else "")
                        + entity + (".*" if star else ""))
                roots.append(N(M.IMPORT, code=code, name=imported_as,
                               full_name=entity, canonical_name=imported_as,
                               line=line))
                continue
            if t.v == ";":
                self.next()
                continue
            node = self.parse_type_decl()
            if node is not None:
                roots.append(node)
        return roots

    def parse_type_decl(self) -> N | None:
        anns = getattr(self, "_pending_anns", []) + self.skip_annotations()
        self._pending_anns = []
        while self.at_any(MODIFIERS):
            self.next()
        t = self.peek()
        if t is None:
            return None
        if t.v in ("class", "interface", "enum", "record"):
            decl = self.parse_java_class(t.v)
            if decl is not None:
                for a in anns:
                    decl.add(a)
            return decl
        # stray token — skip to avoid infinite loop
        self.next()
        return None

    def parse_java_class(self, kw: str, full_override: str | None = None,
                         name_override: str | None = None) -> N:
        kw_tok = self.next()
        name = self.next().v
        full = full_override or self.qual(name)
        self.declared_types[name] = full
        self.typedefs.add(name)
        # class-level type parameters erase for the whole body
        # (GenericsTests.scala:93-136 `class Foo<T extends Number>`)
        self.last_tparams_sig = ""
        env = self._parse_type_params() if self.at("<") else {}
        td_tparams_sig = self.last_tparams_sig
        self.tparam_env.append(env)
        if kw == "record" and self.at("("):
            # record header components -> MEMBER + accessor + canonical
            # `<init>` synthesis (RecordTests.scala:10-131)
            self.next()
            comps: list[tuple[str, str, str, int]] = []
            comp_raws: list[str] = []
            while self.peek() is not None and not self.at(")"):
                self.skip_annotations()
                t0 = self.peek()
                rty = self.parse_java_type()
                raw = self.last_raw_type
                if self.peek() is not None and self.peek().t == "id":
                    nm = self.next()
                    comps.append((rty, self.resolve_type(rty), nm.v, t0.line))
                    comp_raws.append(raw)
                if self.at(","):
                    self.next()
            if self.at(")"):
                self.next()
            self.record_components[full] = comps
            self.record_component_raws[full] = comp_raws
        inherits: list[str] = []
        had_extends = False
        ext_raws: list[str] = []   # raw source texts for the gensig
        impl_raws: list[str] = []
        while self.at_any(("extends", "implements", "permits")):
            which = self.next().v
            while True:
                s0 = self.peek()
                base, targs = self._parse_super_type()
                s_raw = self.src[s0.a:self.toks[self.pos - 1].b] \
                    if s0 is not None else ""
                if which != "permits":
                    inherits.append(base)
                    (ext_raws if which == "extends" else impl_raws).append(s_raw)
                    if targs:
                        self.generic_supers.setdefault(full, []).append(
                            (base, targs))
                    if which == "extends":
                        had_extends = True
                if self.at(","):
                    self.next()
                    continue
                break
        # no explicit superclass -> implicit java.lang.Object, listed FIRST
        # (TypeDeclTests.scala:423-426 inner class implementing an interface
        # inherits [java.lang.Object, ...iface]; :409 bare interface ->
        # [java.lang.Object]; :389 explicit extends suppresses it); enums
        # extend java.lang.Enum, records java.lang.Record
        # (EnumTests.scala:27-29, RecordTests.scala:21-23)
        if not had_extends:
            implicit = {"enum": "java.lang.Enum",
                        "record": "java.lang.Record"}.get(kw, "java.lang.Object")
            inherits.insert(0, implicit)
        self.class_supers[full] = list(inherits)
        # nested type-decl NAME carries the $-joined path from the top-level
        # class (cpg.typeDecl.nameExact("OuterClass$InnerInterface"),
        # TypeDeclTests.scala:407-409); code keeps the simple name
        disp_name = name_override or (
            "$".join([p for p in self.ns if p] + [name]) if self.ns else name)
        decl = N(M.TYPE_DECL, code=f"{kw} {name}", name=disp_name, full_name=full,
                 inherits_from=inherits or None, line=kw_tok.line,
                 ast_parent_type=M.NAMESPACE_BLOCK,
                 ast_parent_full_name=self.global_block)
        # genericSignature: `[<tparams>]<super><ifaces...>`; implicit super
        # LObject / LEnum<LSelf;> / LRecord (GenericSignatureTests typeDecl
        # cases — interfaces always carry the implicit LObject; class bound)
        if kw == "enum":
            decl.generic_signature = (f"LEnum<L{name};>;"
                                      + "".join(self.sig_of_raw(r)
                                                for r in impl_raws))
        else:
            if kw == "record":
                sup = "LRecord;"
            elif kw == "interface":
                sup = "LObject;"
            elif ext_raws:
                sup = self.sig_of_raw(ext_raws[0])
            else:
                sup = "LObject;"
            ifaces = ext_raws if kw == "interface" else impl_raws
            decl.generic_signature = (td_tparams_sig + sup
                                      + "".join(self.sig_of_raw(r)
                                                for r in ifaces))
        self.expect("{")
        self.ns.append(name)
        self.class_ctx.append(full)
        self.class_methods.setdefault(full, {})
        # pre-scan member signatures so intra-class calls resolve regardless of
        # declaration order (JavaParser-style symbol solving, single file)
        self._prescan_members(full)
        while self.peek() is not None and not self.at("}"):
            member = self.parse_member(full, kw)
            if member is not None:
                decl.add(*member) if isinstance(member, list) else decl.add(member)
        if self.at("}"):
            self.next()
        self.ns.pop()
        self.class_ctx.pop()
        # javasrc2cpg creates a default `<init>` for every non-interface
        # type without an explicit constructor (TypeDeclTests.scala:355-375,
        # interfaces excluded per :166-174), and folds non-static field
        # initializers into EVERY constructor body as `this.<f> = <init>`
        # (MemberTests.scala:114-160).
        inits = self.member_inits.pop(full, [])
        if kw == "record":
            self._synthesize_record_parts(decl, full, kw_tok.line)
        elif kw != "interface":
            if M.CONSTRUCTOR not in self.class_methods.get(full, {}):
                decl.add(self._default_constructor(full, kw_tok.line, inits))
            elif inits:
                for m in decl.children:
                    if m.kind == M.METHOD and m.name == M.CONSTRUCTOR:
                        self._inject_member_inits(m, full, inits)
        sinits = self.static_inits.pop(full, [])
        if sinits:
            decl.add(self._clinit_method(full, sinits))
        self._emit_external_bindings(decl, full)
        self.tparam_env.pop()
        return decl

    def _record_accessor(self, full: str, rty: str, ty: str, nm: str,
                         line: int) -> N:
        """`public String value()` returning `this.value`
        (RecordTests.scala:81-130)."""
        m = N(M.METHOD, code=f"public {rty} {nm}()", name=nm,
              full_name=f"{full}.{nm}:{ty}()", signature=f"{ty}()", line=line,
              ast_parent_type=M.TYPE_DECL, ast_parent_full_name=full)
        this = N(M.METHOD_PARAMETER_IN, code="this", name="this",
                 type_full_name=full, param_index=0, line=line,
                 evaluation_strategy=M.BY_SHARING)
        m.add(this)
        body = N(M.BLOCK, line=line)
        this_id = N(M.IDENTIFIER, code="this", name="this",
                    type_full_name=full, arg_index=1, line=line)
        this_id.ref_target = this
        fld = N(M.FIELD_IDENTIFIER, code=nm, name=nm, canonical_name=nm,
                arg_index=2, line=line)
        fa = N(M.CALL, code=f"this.{nm}", name=M.OP_FIELD_ACCESS,
               method_full_name=M.OP_FIELD_ACCESS,
               dispatch_type=M.STATIC_DISPATCH, type_full_name=ty,
               arg_index=1, line=line)
        fa.add(this_id, fld)
        ret = N(M.RETURN, code=f"return this.{nm}", line=line)
        ret.add(fa)
        body.add(ret)
        m.add(body)
        m.add(N(M.METHOD_RETURN, code="RET", type_full_name=ty,
                evaluation_strategy=M.BY_VALUE, line=line))
        return m

    def _record_comp_sigs(self, full: str) -> list[str]:
        """Component generic signatures — the record's class tparam env is
        still active when the synthesized parts are built."""
        raws = self.record_component_raws.get(full, [])
        return [self.sig_of_raw(r) for r in raws]

    def _canonical_record_ctor(self, full: str, line: int) -> N:
        """Canonical `<init>` assigning every component
        (RecordTests.scala:179-217)."""
        comps = self.record_components.get(full, [])
        tys = [ty for _, ty, _, _ in comps]
        simple = full.split(".")[-1].split("$")[-1]
        ctor = N(M.METHOD, code=f"public {simple}({', '.join(tys)})",
                 name=M.CONSTRUCTOR,
                 full_name=f"{full}.{M.CONSTRUCTOR}:void({','.join(tys)})",
                 signature=f"void({','.join(tys)})", line=line,
                 ast_parent_type=M.TYPE_DECL, ast_parent_full_name=full,
                 generic_signature=("("
                                    + "".join(self._record_comp_sigs(full))
                                    + ")V"))
        this = N(M.METHOD_PARAMETER_IN, code="this", name="this",
                 type_full_name=full, param_index=0, line=line,
                 evaluation_strategy=M.BY_SHARING)
        ctor.add(this)
        params = []
        for i, (rty, ty, nm, _ln) in enumerate(comps, start=1):
            p = N(M.METHOD_PARAMETER_IN, code=f"{rty} {nm}", name=nm,
                  type_full_name=ty, param_index=i, line=line,
                  evaluation_strategy=(M.BY_VALUE if ty in JAVA_PRIMITIVES
                                       else M.BY_SHARING))
            ctor.add(p)
            params.append(p)
        body = N(M.BLOCK, line=line)
        for (rty, ty, nm, _ln), p in zip(comps, params):
            body.add(self._record_component_assign(full, ty, nm, line, this, p))
        ctor.add(body)
        ctor.add(N(M.METHOD_RETURN, code="RET", type_full_name="void",
                   evaluation_strategy=M.BY_VALUE, line=line))
        return ctor

    def _record_component_assign(self, full: str, ty: str, nm: str, line: int,
                                 this_param: N, value_param: N | None) -> N:
        this_id = N(M.IDENTIFIER, code="this", name="this",
                    type_full_name=full, arg_index=1, line=line)
        this_id.ref_target = this_param
        fld = N(M.FIELD_IDENTIFIER, code=nm, name=nm, canonical_name=nm,
                arg_index=2, line=line)
        fa = N(M.CALL, code=f"this.{nm}", name=M.OP_FIELD_ACCESS,
               method_full_name=M.OP_FIELD_ACCESS,
               dispatch_type=M.STATIC_DISPATCH, type_full_name=ty,
               arg_index=1, line=line)
        fa.add(this_id, fld)
        val = N(M.IDENTIFIER, code=nm, name=nm, type_full_name=ty,
                arg_index=2, line=line)
        if value_param is not None:
            val.ref_target = value_param
        asg = N(M.CALL, code=f"this.{nm} = {nm}", name=M.OP_ASSIGNMENT,
                method_full_name=M.OP_ASSIGNMENT,
                dispatch_type=M.STATIC_DISPATCH, type_full_name=ty, line=line)
        asg.add(fa, val)
        return asg

    def _synthesize_record_parts(self, decl: N, full: str, line: int) -> None:
        comps = self.record_components.get(full, [])
        if not comps:
            return
        comp_sigs = self._record_comp_sigs(full)
        declared = {c.name for c in decl.children if c.kind == M.METHOD}
        for (rty, ty, nm, ln), csig in zip(comps, comp_sigs):
            decl.add(N(M.MEMBER, code=f"{rty} {nm}", name=nm,
                       type_full_name=ty, line=ln,
                       ast_parent_type=M.TYPE_DECL,
                       ast_parent_full_name=full,
                       generic_signature=csig))
            if nm not in declared:
                acc = self._record_accessor(full, rty, ty, nm, ln)
                acc.generic_signature = f"(){csig}"
                decl.add(acc)
        canon_sig = f"void({','.join(ty for _, ty, _, _ in comps)})"
        have_canon = full in self.compact_ctor_classes or any(
            c.kind == M.METHOD and c.name == M.CONSTRUCTOR
            and c.signature == canon_sig for c in decl.children)
        if not have_canon:
            decl.add(self._canonical_record_ctor(full, line))

    def _emit_external_bindings(self, decl: N, full: str) -> None:
        """BINDING children for erased signatures inherited from EXTERNAL
        generic supertypes: a method whose parameter types equal the
        supertype's type arguments also binds under the argument positions
        erased to java.lang.Object (BindingTests.scala:16-27: SomeConsumer
        implements Consumer<Integer> -> accept binds void(java.lang.Integer)
        AND void(java.lang.Object)). Internal supertypes are handled by the
        distributed binding pass over the inheritance closure."""
        sups = self.generic_supers.get(full)
        if not sups:
            return
        internal = set(self.declared_types.values())
        ext = [(s, targs) for s, targs in sups if s not in internal]
        if not ext:
            return
        for m in [c for c in decl.children
                  if c.kind == M.METHOD and c.name != M.CONSTRUCTOR]:
            sig = m.signature
            if "(" not in sig:
                continue
            ret, inner = sig.split("(", 1)
            inner = inner.rstrip(")")
            params = inner.split(",") if inner else []
            for _sfn, targs in ext:
                erased_args = set()
                for a in targs:
                    base = a.split("<", 1)[0].strip()
                    if base and base != "?":
                        erased_args.add(self.resolve_type(base))
                mapped = ["java.lang.Object" if p in erased_args else p
                          for p in params]
                if mapped == params:
                    continue
                bsig = f"{ret}({','.join(mapped)})"
                b = N(M.BINDING, code=f"{m.name}:{bsig}", name=m.name,
                      signature=bsig, method_full_name=m.full_name,
                      line=m.line, ast_parent_type=M.TYPE_DECL,
                      ast_parent_full_name=full)
                b.ref_target = m
                decl.add(b)

    def _member_init_assign(self, class_full: str, fname: str, ty: str,
                            init: N, line: int, this_param: N | None) -> N:
        this_id = N(M.IDENTIFIER, code="this", name="this",
                    type_full_name=class_full, arg_index=1, line=line)
        if this_param is not None:
            this_id.ref_target = this_param
        fld = N(M.FIELD_IDENTIFIER, code=fname, name=fname,
                canonical_name=fname, arg_index=2, line=line)
        fa = N(M.CALL, code=f"this.{fname}", name=M.OP_FIELD_ACCESS,
               method_full_name=M.OP_FIELD_ACCESS,
               dispatch_type=M.STATIC_DISPATCH, type_full_name=ty,
               arg_index=1, line=line)
        fa.add(this_id, fld)
        init_c = _clone_ast(init)
        init_c.arg_index = 2
        asg = N(M.CALL, code=f"this.{fname} = {init.code}",
                name=M.OP_ASSIGNMENT, method_full_name=M.OP_ASSIGNMENT,
                dispatch_type=M.STATIC_DISPATCH, type_full_name=ty, line=line)
        asg.add(fa, init_c)
        return asg

    def _clinit_method(self, class_full: str,
                       inits: list[tuple[str, str, N, int]]) -> N:
        """Synthesized `<clinit>` holding the static field initializers as
        `<operator>.assignment` calls whose target is an implicit-TYPE_REF-
        base fieldAccess (AstForMethodsCreator.clinitAstFromStaticInits +
        AstForNameExpressionsCreator.createImplicitBaseFieldAccess: static
        base renders as the simple class name; assignment code keeps the
        declared-type prefix — NewObjectTests.scala expects
        `String Bar.CONST = "<const>"`)."""
        simple = class_full.split(".")[-1]
        line = inits[0][3]
        m = N(M.METHOD, code=M.STATIC_INIT, name=M.STATIC_INIT,
              full_name=f"{class_full}.{M.STATIC_INIT}:void()",
              signature="void()", line=line, ast_parent_type=M.TYPE_DECL,
              ast_parent_full_name=class_full)
        body = N(M.BLOCK, line=line)
        for fname, raw_ty, init, iline, plocs in inits:
            body.children.extend(plocs)  # pattern locals before the assign
            ty = self.resolve_type(raw_ty)
            base = N(M.TYPE_REF, code=simple, type_full_name=class_full,
                     arg_index=1, line=iline)
            fld = N(M.FIELD_IDENTIFIER, code=fname, name=fname,
                    canonical_name=fname, arg_index=2, line=iline)
            fa = N(M.CALL, code=f"{simple}.{fname}", name=M.OP_FIELD_ACCESS,
                   method_full_name=M.OP_FIELD_ACCESS,
                   dispatch_type=M.STATIC_DISPATCH, type_full_name=ty,
                   arg_index=1, line=iline)
            fa.add(base, fld)
            init_c = _clone_ast(init)
            init_c.arg_index = 2
            asg = N(M.CALL, code=f"{raw_ty} {simple}.{fname} = {init.code}",
                    name=M.OP_ASSIGNMENT, method_full_name=M.OP_ASSIGNMENT,
                    dispatch_type=M.STATIC_DISPATCH, type_full_name=ty,
                    line=iline)
            asg.add(fa, init_c)
            body.add(asg)
        m.add(body)
        m.line_end = line
        m.add(N(M.METHOD_RETURN, code="RET", type_full_name="void",
                evaluation_strategy=M.BY_VALUE, line=line))
        return m

    def _default_constructor(self, class_full: str, line: int,
                             inits: list[tuple[str, str, N, int]]) -> N:
        simple = class_full.split(".")[-1]
        ctor = N(M.METHOD, code=f"{simple}()", name=M.CONSTRUCTOR,
                 full_name=f"{class_full}.{M.CONSTRUCTOR}:void()",
                 signature="void()", line=line, ast_parent_type=M.TYPE_DECL,
                 ast_parent_full_name=class_full, generic_signature="()V")
        this = N(M.METHOD_PARAMETER_IN, code="this", name="this",
                 type_full_name=class_full, param_index=0, line=line,
                 evaluation_strategy=M.BY_SHARING)
        ctor.add(this)
        body = N(M.BLOCK, line=line)
        for fname, ty, init, iline, plocs in inits:
            body.children.extend(plocs)
            body.add(self._member_init_assign(class_full, fname, ty, init,
                                              iline, this))
        ctor.add(body)
        ctor.line_end = line
        ctor.add(N(M.METHOD_RETURN, code="RET", type_full_name="void",
                   evaluation_strategy=M.BY_VALUE, line=line))
        return ctor

    def _inject_member_inits(self, ctor: N, class_full: str,
                             inits: list[tuple[str, str, N, int]]) -> None:
        body = next((c for c in ctor.children if c.kind == M.BLOCK), None)
        if body is None:
            return
        this_param = next((c for c in ctor.children
                           if c.kind == M.METHOD_PARAMETER_IN
                           and c.name == "this"), None)
        # pattern locals are cloned per constructor (node identity must be
        # unique per METHOD) with identifier refs remapped to the clones
        stmts: list[N] = []
        for fname, ty, init, iline, plocs in inits:
            remap = {id(l): _clone_ast(l) for l in plocs}
            stmts.extend(remap.values())
            stmts.append(self._member_init_assign(
                class_full, fname, ty,
                _clone_ast(init, remap) if remap else init,
                iline, this_param))
        body.children[0:0] = stmts

    def _prescan_members(self, class_full: str):
        """Scan ahead (token-level) to register method name→fullname before
        parsing bodies, so forward references link."""
        save = self.pos
        depth = 0
        i = self.pos
        toks = self.toks
        n = len(toks)
        while i < n:
            v = toks[i].v
            if v == "{":
                depth += 1
            elif v == "}":
                if depth == 0:
                    break
                depth -= 1
            elif v == "(" and depth == 0 and i > self.pos:
                # method candidate: ident before '('
                j = i - 1
                if toks[j].t == "id":
                    mname = toks[j].v
                    # find return type token(s) before name; detect static;
                    # collect a method-level `<T extends B>` group so the
                    # registered signature is ERASED like the parsed one
                    # (GenericsTests.scala:43-51 call mfn uses erased types)
                    k = j - 1
                    is_static = False
                    ret = "void"
                    ret_arr = 0  # array dims on the return type (T[] foo())
                    genv: dict[str, str] = {}
                    while k >= 0 and toks[k].v in ("]", "["):
                        if toks[k].v == "]":
                            ret_arr += 1
                        k -= 1
                    if k >= 0 and toks[k].v == ">":
                        # return type's own generic args — skip balanced
                        d = 1
                        k -= 1
                        while k >= 0 and d:
                            if toks[k].v == ">":
                                d += 1
                            elif toks[k].v == "<":
                                d -= 1
                            k -= 1
                    if k >= 0 and (toks[k].t == "id" or (toks[k].t == "kw" and toks[k].v in JAVA_TYPE_KEYWORDS)):
                        ret = toks[k].v
                        k -= 1
                    while k >= 1 and toks[k].v == "." and toks[k - 1].t == "id":
                        k -= 2
                    if k >= 0 and toks[k].v == ">":
                        # method type-parameter group: collect back to '<'
                        d = 1
                        k -= 1
                        grp = []
                        while k >= 0 and d:
                            if toks[k].v == ">":
                                d += 1
                            elif toks[k].v == "<":
                                d -= 1
                            if d:
                                grp.append(toks[k])
                            k -= 1
                        grp.reverse()
                        # parse `T [extends Bound[.Q]*] [, ...]` erasures
                        gi = 0
                        while gi < len(grp):
                            if grp[gi].t != "id":
                                gi += 1
                                continue
                            tp_name = grp[gi].v
                            gi += 1
                            bound = None
                            if gi < len(grp) and grp[gi].v == "extends":
                                gi += 1
                                parts = []
                                while gi < len(grp) and (grp[gi].t == "id" or grp[gi].v == "."):
                                    parts.append(grp[gi].v)
                                    gi += 1
                                bound = "".join(parts)
                                # drop compound `& B` bounds
                                while gi < len(grp) and grp[gi].v != ",":
                                    gi += 1
                            genv[tp_name] = (self.resolve_type(bound)
                                             if bound else "java.lang.Object")
                            while gi < len(grp) and grp[gi].v != ",":
                                gi += 1
                            gi += 1
                        # chase param-as-bound one level (U extends T)
                        for tp_name, b in list(genv.items()):
                            if b in genv:
                                genv[tp_name] = genv[b]
                    while k >= 0 and toks[k].v in MODIFIERS:
                        if toks[k].v == "static":
                            is_static = True
                        k -= 1
                    # param types: scan inside parens at same depth
                    ptypes: list[str] = []
                    ptargs: list[list[str] | None] = []
                    is_varargs = False
                    d2 = 0
                    ang = 0  # generic-args depth: `Map<String, int[]>`
                    ang_start = None
                    m2 = i
                    expect_type = True
                    while m2 < n:
                        vv = toks[m2].v
                        if vv == "(":
                            d2 += 1
                        elif vv == ")":
                            d2 -= 1
                            if d2 == 0:
                                break
                        elif d2 == 1 and vv == "<":
                            if ang == 0 and ptypes and not expect_type:
                                ang_start = m2 + 1
                            ang += 1
                        elif d2 == 1 and vv == ">":
                            ang -= 1
                            if ang == 0 and ang_start is not None and ptargs:
                                # declared type args per param, e.g.
                                # Function<String, String> — drives lambda
                                # target-typing at the call site
                                inner = self.src[toks[ang_start].a:
                                                 toks[m2].a].strip()
                                if inner and "<" not in inner:
                                    ptargs[-1] = [x.strip()
                                                  for x in inner.split(",")]
                                ang_start = None
                        elif d2 == 1 and ang == 0 and expect_type and (toks[m2].t == "id" or (toks[m2].t == "kw" and toks[m2].v in JAVA_TYPE_KEYWORDS)):
                            pv = toks[m2].v
                            ptypes.append(genv.get(pv) or self.resolve_type(pv))
                            ptargs.append(None)
                            expect_type = False
                        elif d2 == 1 and ang == 0 and vv == "..." and ptypes:
                            ptypes[-1] += "[]"  # varargs erase to arrays
                            is_varargs = True
                        elif d2 == 1 and ang == 0 and vv == "[" \
                                and m2 + 1 < n and toks[m2 + 1].v == "]" \
                                and ptypes and not expect_type:
                            # array dims keep their suffix under erasure:
                            # `T[] aaa` -> java.lang.Object[] (CallTests
                            # "call to method with generic array parameter")
                            ptypes[-1] += "[]"
                            m2 += 1
                        elif d2 == 1 and ang == 0 and vv == ",":
                            expect_type = True
                        m2 += 1
                    if mname == class_full.split(".")[-1]:
                        fullname = f"{class_full}.{M.CONSTRUCTOR}:void({','.join(ptypes)})"
                        self.class_methods[class_full].setdefault(
                            M.CONSTRUCTOR, []).append(
                            (fullname, False, list(ptypes)))
                        if is_varargs:
                            self.varargs_methods.add(
                                f"{M.CONSTRUCTOR}:void({','.join(ptypes)})")
                    else:
                        rty = (genv.get(ret) or self.resolve_type(ret)) \
                            + "[]" * ret_arr
                        sig = f"{rty}({','.join(ptypes)})"
                        fullname = f"{class_full}.{mname}:{sig}"
                        self.class_methods[class_full].setdefault(
                            mname, []).append(
                            (fullname, is_static, list(ptypes)))
                        if any(ptargs):
                            self.method_param_targs[fullname] = list(ptargs)
                        if is_varargs:
                            # keyed name:sig — call sites re-prefix the
                            # fullname with the receiver's static type
                            self.varargs_methods.add(f"{mname}:{sig}")
                    # skip past this member's body/semicolon
            i += 1
        self.pos = save

    def parse_member(self, class_full: str, class_kw: str):
        anns = self.skip_annotations()
        is_static = False
        while self.at_any(MODIFIERS):
            if self.at("static"):
                is_static = True
            self.next()
        anns += self.skip_annotations()  # `public @Override void ...`
        member = self._parse_member_rest(class_full, class_kw, is_static)
        if anns:
            targets = member if isinstance(member, list) else [member]
            for mnode in targets or []:
                if mnode is not None and mnode.kind in (
                        M.METHOD, M.TYPE_DECL, M.MEMBER):
                    for a in anns:
                        mnode.add(a)
                    break
        return member

    def _parse_member_rest(self, class_full: str, class_kw: str,
                           is_static: bool):
        if self.at(";"):
            self.next()
            return None
        if self.at("{"):  # instance/static initializer block
            # `this` inside an initializer is the DECLARING class's this —
            # not an enclosing lambda/method's (CapturingTests "instance
            # initializers in anonymous classes": no `this` leak). The
            # synthetic binding is never attached to the AST, so refs to it
            # flatten to -1 (no crossing-capture edge).
            self.push_scope()
            self.declare("this", N(M.METHOD_PARAMETER_IN, code="this",
                                   name="this", type_full_name=class_full,
                                   param_index=0,
                                   evaluation_strategy=M.BY_SHARING))
            try:
                blk = self.parse_compound()
            finally:
                self.pop_scope()
            return None if not blk.children else blk
        t = self.peek()
        if t is None:
            return None
        if t.v in ("class", "interface", "enum", "record"):
            return self.parse_java_class(t.v)
        if self.at("<"):  # generic method type params — erase for this member
            self.last_tparams_sig = ""
            self.tparam_env.append(self._parse_type_params())
            self._pending_tparams_sig = self.last_tparams_sig
            try:
                return self._parse_member_tail(class_full, class_kw, is_static)
            finally:
                self.tparam_env.pop()
                self._pending_tparams_sig = ""
        return self._parse_member_tail(class_full, class_kw, is_static)

    def _parse_member_tail(self, class_full: str, class_kw: str,
                           is_static: bool):
        start = self.peek()
        if start is None:
            return None
        # constructor
        cls_simple = class_full.split(".")[-1].split("$")[-1]
        if start.t == "id" and start.v == cls_simple and self.at("(", 1):
            self.next()
            return self.parse_java_method("void", M.CONSTRUCTOR, start, class_full,
                                          is_static=False)
        # compact record constructor: `public Foo { ... }` — becomes the
        # canonical ctor: record-component params, `this.x = x` assigns
        # FIRST, then the compact body (RecordTests.scala:25-70)
        if (class_kw == "record" and start.t == "id" and start.v == cls_simple
                and self.at("{", 1)):
            self.next()
            return self._parse_compact_ctor(class_full, start)
        if class_kw == "enum" and start is not None and start.t == "id" and not self.looks_like_java_type():
            # enum constants -> MEMBER nodes typed as the enum itself; code
            # keeps the argument list, no AST children (EnumTests.scala:35-74)
            simple = class_full.split(".")[-1].split("$")[-1]
            consts: list[N] = []
            while self.peek() is not None and not self.at(";") and not self.at("}"):
                t0 = self.peek()
                if t0.t != "id":
                    self.next()
                    continue
                nm_tok = self.next()
                code = nm_tok.v
                if self.at("("):
                    close = self.skip_balanced("(", ")")
                    code = self.src[nm_tok.a:close.b]
                if self.at("{"):
                    self.skip_balanced("{", "}")
                consts.append(N(M.MEMBER, code=code, name=nm_tok.v,
                                type_full_name=class_full, line=nm_tok.line,
                                ast_parent_type=M.TYPE_DECL,
                                ast_parent_full_name=class_full,
                                generic_signature=f"L{simple};"))
                if self.at(","):
                    self.next()
            if self.at(";"):
                self.next()
            return consts or None
        if start.t == "id" and self.at("(", 1):
            # return-type-less method declaration (`public foo() {...}`) —
            # JavaParser tolerates these (javasrc LambdaTests fixtures);
            # recover as a void method named after the identifier
            self.next()
            return self.parse_java_method("void", start.v, start, class_full,
                                          is_static=is_static)
        raw_ty = self.parse_java_type()
        decl_raw = self.last_raw_type  # full raw text (generic args included)
        ty = self.resolve_type(raw_ty)
        if self.peek() is None or self.peek().t != "id":
            # skip unparseable
            while self.peek() is not None and not self.at_any((";", "}")):
                if self.at("{"):
                    self.skip_balanced("{", "}")
                    return None
                self.next()
            if self.at(";"):
                self.next()
            return None
        name = self.next().v
        if self.at("("):
            self._pending_ret_raw = decl_raw
            return self.parse_java_method(ty, name, start, class_full, is_static=is_static)
        # field(s)
        members = [N(M.MEMBER, code=f"{ty} {name}", name=name, type_full_name=ty,
                     line=start.line, ast_parent_type=M.TYPE_DECL,
                     ast_parent_full_name=class_full,
                     generic_signature=self.sig_of_raw(decl_raw))]
        self.declare(name, members[0])
        if is_static:
            self.static_member_ids.add(id(members[0]))
        self._maybe_member_init(class_full, name, ty, is_static, start.line,
                                raw_ty)
        while self.peek() is not None and not self.at(";"):
            if self.at(","):
                self.next()
                if self.peek() is not None and self.peek().t == "id":
                    nm2 = self.next().v
                    mb = N(M.MEMBER, code=f"{ty} {nm2}", name=nm2, type_full_name=ty,
                           line=start.line, ast_parent_type=M.TYPE_DECL,
                           ast_parent_full_name=class_full,
                           generic_signature=self.sig_of_raw(decl_raw))
                    members.append(mb)
                    self.declare(nm2, mb)
                    if is_static:
                        self.static_member_ids.add(id(mb))
                    self._maybe_member_init(class_full, nm2, ty, is_static,
                                            start.line, raw_ty)
                continue
            if self.at("{"):
                self.skip_balanced("{", "}")
                continue
            if self.at("("):
                self.skip_balanced("(", ")")
                continue
            self.next()
        if self.at(";"):
            self.next()
        return members

    def _parse_compact_ctor(self, class_full: str, start: Tok) -> N:
        comps = self.record_components.get(class_full, [])
        tys = [ty for _, ty, _, _ in comps]
        simple = class_full.split(".")[-1].split("$")[-1]
        ctor = N(M.METHOD, code=f"public {simple}", name=M.CONSTRUCTOR,
                 full_name=f"{class_full}.{M.CONSTRUCTOR}:void({','.join(tys)})",
                 signature=f"void({','.join(tys)})", line=start.line,
                 ast_parent_type=M.TYPE_DECL, ast_parent_full_name=class_full,
                 generic_signature=("("
                                    + "".join(self._record_comp_sigs(class_full))
                                    + ")V"))
        self.push_scope()
        self.method_ctx.append(ctor.full_name)
        this = N(M.METHOD_PARAMETER_IN, code="this", name="this",
                 type_full_name=class_full, param_index=0, line=start.line,
                 evaluation_strategy=M.BY_SHARING)
        ctor.add(this)
        self.declare("this", this)
        params = []
        for i, (rty, ty, nm, _ln) in enumerate(comps, start=1):
            p = N(M.METHOD_PARAMETER_IN, code=f"{rty} {nm}", name=nm,
                  type_full_name=ty, param_index=i, line=start.line,
                  evaluation_strategy=(M.BY_VALUE if ty in JAVA_PRIMITIVES
                                       else M.BY_SHARING))
            ctor.add(p)
            params.append(p)
            self.declare(nm, p)
        frame = self._push_pattern_frame()
        body = None
        try:
            body = self.parse_compound()
        finally:
            self._pop_pattern_frame(frame, body)
        for (rty, ty, nm, _ln), p in reversed(list(zip(comps, params))):
            body.children.insert(0, self._record_component_assign(
                class_full, ty, nm, start.line, this, p))
        ctor.add(body)
        ctor.add(N(M.METHOD_RETURN, code="RET", type_full_name="void",
                   evaluation_strategy=M.BY_VALUE, line=start.line))
        self.method_ctx.pop()
        self.pop_scope()
        self.compact_ctor_classes.add(class_full)
        self.class_methods.setdefault(class_full, {})[M.CONSTRUCTOR] = [(
            ctor.full_name, False,
            [self.resolve_type(t) for (_r, t, _n, _l) in comps])]
        return ctor

    def _maybe_member_init(self, class_full: str, name: str, ty: str,
                           is_static: bool, line: int,
                           raw_ty: str = "") -> None:
        """Capture a non-static field initializer expression; javasrc2cpg
        moves these into every constructor as `this.<name> = <init>`
        (MemberTests.scala:114-160: the MEMBER itself keeps no children).
        Static initializers go to a synthesized `<clinit>` method
        (AstForTypeDeclsCreator.getStaticFieldInitializers +
        clinitAstFromStaticInits). Brace array initializers are skipped
        (the generic token-skip in the caller eats them)."""
        if not self.at("="):
            return
        if self.peek(1) is not None and self.peek(1).v == "{":
            return  # array initializer — leave to the skip loop
        save = self.pos
        self.next()
        self.anon_ctx.append((f"{class_full}.{name}", class_full, is_static,
                              None))
        pmark = len(self.pending_pattern_locals)
        bmark = self._pattern_mark()
        try:
            init = self.parse_assignment_expr()
        except Exception:
            self.pos = save
            del self.pending_pattern_locals[pmark:]
            self._pattern_restore(bmark)
            return
        finally:
            self.anon_ctx.pop()
        # instanceof-pattern locals hoisted by the initializer land at the
        # start of the <init>/<clinit> body (PatternExprTests "a pattern
        # matching instanceof in a (static) field initializer"); the eager
        # scope binding must not leak past the initializer (JLS 6.3)
        plocs = self.pending_pattern_locals[pmark:]
        del self.pending_pattern_locals[pmark:]
        self._pattern_restore(bmark)
        member = self.lookup(name)
        if member is not None and member.kind == M.MEMBER:
            self.note_init_dynamic_type(member, init)
        if is_static:
            self.static_inits.setdefault(class_full, []).append(
                (name, raw_ty or ty, init, line, plocs))
        else:
            self.member_inits.setdefault(class_full, []).append(
                (name, ty, init, line, plocs))

    def parse_java_method(self, ret_ty: str, name: str, start: Tok,
                          class_full: str, is_static: bool):
        self.expect("(")
        # (resolved type, raw source type, name, variadic) — code keeps the
        # raw spelling ("String s", SynchronizedTests.scala:46)
        # the return type was the last type parsed before the param list —
        # its type args target-type `return <lambda>` (LambdaTests
        # "returned from a function")
        ret_targs = self.last_type_args
        ret_raw, self._pending_ret_raw = self._pending_ret_raw, ""
        tp_sig, self._pending_tparams_sig = self._pending_tparams_sig, ""
        params: list[tuple[str, str, str, bool]] = []
        param_sig_raws: list[str] = []
        targs_by_name: dict[str, list[str]] = {}
        anns_by_name: dict[str, list] = {}
        while not self.at(")"):
            p_anns = self.skip_annotations()
            while self.at("final"):
                self.next()
            raw_pty = self.parse_java_type()
            p_sig_raw = self.last_raw_type
            p_targs = self.last_type_args  # `Function<String, Integer>`
            pty = self.resolve_type(raw_pty)
            variadic = False
            if self.at("..."):
                self.next()
                variadic = True
                pty += "[]"
                raw_pty += "..."
                p_sig_raw += "[]"
            pname = self.next().v if self.peek() is not None and self.peek().t == "id" else ""
            while self.at("[") and self.at("]", 1):
                self.next(); self.next()
                pty += "[]"
                raw_pty += "[]"
                p_sig_raw += "[]"
            params.append((pty, raw_pty, pname, variadic))
            param_sig_raws.append(p_sig_raw)
            if p_targs and pname:
                targs_by_name[pname] = p_targs
            if p_anns and pname:
                # parameter annotations attach to the METHOD_PARAMETER_IN
                # (AnnotationTests "parameter annotations")
                anns_by_name[pname] = p_anns
            if self.at(","):
                self.next()
        self.expect(")")
        if self.at("throws"):
            self.next()
            self.parse_java_type()
            while self.at(","):
                self.next()
                self.parse_java_type()
        sig = f"{ret_ty}({','.join(p[0] for p in params)})"
        full_name = f"{class_full}.{name}:{sig}"
        if self.at(";"):  # abstract/interface method — still a METHOD decl
            self.next()
            body = None
        elif self.at("{"):
            body = True
        else:
            self.skip_to_semicolon()
            return None
        method = N(M.METHOD, code=f"{ret_ty} {name}({','.join(p[0] for p in params)})",
                   name=name, full_name=full_name, signature=sig, line=start.line,
                   ast_parent_type=M.TYPE_DECL, ast_parent_full_name=class_full)
        # `[<tparams>](param sigs)ret sig` — ctors return V
        ret_sig = "V" if name == M.CONSTRUCTOR \
            else self.sig_of_raw(ret_raw or ret_ty)
        method.generic_signature = (
            tp_sig + "(" + "".join(self.sig_of_raw(r) for r in param_sig_raws)
            + ")" + ret_sig)
        self.push_scope()
        self.method_ctx.append(full_name)
        if not is_static:
            this = N(M.METHOD_PARAMETER_IN, code="this", name="this",
                     type_full_name=class_full, param_index=0, line=start.line,
                     evaluation_strategy=M.BY_SHARING)
            method.add(this)
            self.declare("this", this)
        for i, (pty, raw_pty, pname, var) in enumerate(params, start=1):
            # primitives BY_VALUE, objects/arrays BY_SHARING
            # (AstForMethodsCreator.scala:361; MethodParameterTests.scala:27-45)
            p = N(M.METHOD_PARAMETER_IN, code=f"{raw_pty} {pname}".strip(), name=pname,
                  type_full_name=pty, param_index=i, is_variadic=var,
                  line=start.line,
                  generic_signature=self.sig_of_raw(param_sig_raws[i - 1]),
                  evaluation_strategy=(M.BY_VALUE if pty in JAVA_PRIMITIVES
                                       else M.BY_SHARING))
            method.add(p)
            for a in anns_by_name.get(pname, ()):
                p.add(a)
            if pname in targs_by_name:
                self.decl_targs[id(p)] = targs_by_name[pname]
            if pname:
                self.declare(pname, p)
        if body:
            self.anon_ctx.append((f"{class_full}.{name}", class_full,
                                  is_static, full_name))
            frame = self._push_pattern_frame()
            self.method_ret_ctx.append((ret_ty, ret_targs))
            blk = None
            try:
                blk = self.parse_compound()
            finally:
                self.anon_ctx.pop()
                self.method_ret_ctx.pop()
                self._pop_pattern_frame(frame, blk)
            method.add(blk)
            method.line_end = blk.line_end
        method.add(N(M.METHOD_RETURN, code="RET", type_full_name=ret_ty,
                     evaluation_strategy=M.BY_VALUE, line=start.line))
        self.method_ctx.pop()
        self.pop_scope()
        return method

    # ---------------- statements: Java deltas ----------------
    def wrap_condition(self, cond: N) -> N:
        return cond  # Java conditions are boolean — no !=0 wrap

    def this_expr(self, t: Tok) -> N:
        """Java `this`: REFs the enclosing method's `this` parameter and
        carries its (non-pointer) type (CallTests "have ref edges from
        explicit `this` to method parameter")."""
        decl = self.lookup("this")
        chain = self._enclosing_class_chain()
        node = N(M.IDENTIFIER, code="this", name="this", line=t.line,
                 type_full_name=(decl.type_full_name if decl is not None
                                 else (chain[0] if chain else M.ANY)))
        if decl is not None:
            node.ref_target = decl
        return node

    def make_else(self, e: Tok, stmts: list[N]) -> N:
        """javasrc: the else branch is a plain BLOCK reached via FALSE_BODY
        (an else-if chain nests the second IF inside that block,
        ControlStructureTests.scala:701-716)."""
        b = N(M.BLOCK, code="", role=M.ROLE_WHEN_FALSE, line=e.line,
              type_full_name="void")
        b.add(*stmts)
        return b

    def parse_statement(self) -> list[N]:
        t = self.peek()
        if t is None:
            return []
        if t.v == "finally":  # handled by parse_try; defensive skip
            self.next()
            return [self.parse_compound()]
        if t.v in ("synchronized",) and self.at("(", 1):
            # synchronized(expr) { ... } -> BLOCK [MODIFIER, expr, BLOCK]
            # (SynchronizedTests.scala:52-62)
            kw = self.next()
            self.expect("(")
            expr = self.parse_expression()
            self.expect(")")
            blk = N(M.BLOCK, code=f"synchronized ({expr.code})", line=kw.line,
                    type_full_name="void")
            mod = N(M.MODIFIER, code="SYNCHRONIZED", name="SYNCHRONIZED",
                    line=kw.line)
            body = self.parse_compound()
            blk.add(mod, expr, body)
            return [blk]
        if t.v == "assert":
            self.next()
            expr = self.parse_expression()
            if self.at(":"):
                self.next()
                self.parse_expression()
            if self.at(";"):
                self.next()
            return [expr] if expr is not None else []
        if t.v in ("break", "continue") and self.peek(1) is not None and self.peek(1).t == "id":
            kw = self.next()
            label = self.next().v
            semi = self.expect(";")
            cst = M.CS_BREAK if kw.v == "break" else M.CS_CONTINUE
            return [N(M.CONTROL_STRUCTURE, code=self.slice(kw, semi),
                      control_structure_type=cst, jump_label=label, line=kw.line)]
        if t.v in ("class", "interface", "enum", "record") \
                and self.peek(1) is not None and self.peek(1).t == "id":
            return [self._parse_local_class(t.v)]
        mark = self._pattern_mark()
        pmark = len(self.pending_pattern_locals)
        self._stmt_depth += 1
        try:
            out = super().parse_statement()
        finally:
            self._stmt_depth -= 1
        if self._twr_prelude and out \
                and any(getattr(n, "control_structure_type", "") == M.CS_TRY
                        for n in out):
            # try-with-resources: locals + resource assignments precede the
            # TRY as sibling statements (NewControlStructureTests:70-122)
            out = self._twr_prelude + list(out)
            self._twr_prelude = []
        is_cs = len(out) == 1 and out[0].kind == M.CONTROL_STRUCTURE
        if len(self.pending_pattern_locals) > pmark:
            # pattern locals hoisted by this statement's expressions are
            # placed immediately BEFORE it (astsForStatement:79-84
            # patternVariableAsts ++ statementAsts); deeper statements
            # already drained their own
            out = self.pending_pattern_locals[pmark:] + list(out)
            del self.pending_pattern_locals[pmark:]
        if len(self.pattern_binds) > mark and out and not is_cs:
            # pattern variables introduced by a non-control statement
            # (vardecl / expression statement) do not outlive it — restore,
            # unless an overridden control parser already decided keeps
            # (those re-push ABOVE their own mark and we only see leftovers)
            self._pattern_restore(mark)
        return out

    def _parse_local_class(self, kw: str) -> N:
        """Class declared inside a method body (LocalClassTests.scala):
        fullname `{enclosingMethodFullName}.{Name}`; captured enclosing
        locals/params become MEMBERs plus constructor parameters (after
        `outerClass` in instance contexts, alphabetical) with
        `this.<x> = <x>` assignments first in every constructor body."""
        mfn = self.anon_ctx[-1][3] if self.anon_ctx else None
        name = self.peek(1).v
        full = f"{mfn}.{name}" if mfn else None
        decl = self.parse_java_class(kw, full_override=full,
                                     name_override=name)
        if decl is None:
            return decl
        encl_cls = self.anon_ctx[-1][1] if self.anon_ctx else ""
        is_static = self.anon_ctx[-1][2] if self.anon_ctx else True
        if kw in ("record", "enum", "interface"):
            is_static = True  # local records/enums/interfaces are static
        # captured = identifiers referencing LOCAL/PARAM declarations
        # OUTSIDE the local class subtree (members capture via outerClass)
        inside: set[int] = set()

        def collect(n: N) -> None:
            inside.add(id(n))
            for c in n.children:
                collect(c)
        collect(decl)
        captured: dict[str, N] = {}

        def find(n: N) -> None:
            d = n.ref_target
            if n.kind == M.IDENTIFIER and d is not None \
                    and id(d) not in inside and n.name != "this" \
                    and d.kind in (M.LOCAL, M.METHOD_PARAMETER_IN) \
                    and self.decl_method.get(id(d)) == (mfn or ""):
                captured.setdefault(d.name, d)
            for c in n.children:
                find(c)
        find(decl)
        cap_names = sorted(captured)
        line = decl.line
        full = decl.full_name
        if not is_static and encl_cls:
            # outerClass signs the enclosing class WITHOUT its type args —
            # the outer's type vars have no meaning inside the local class
            # (GenericSignatureTests "a local class with captures")
            decl.add(N(M.MEMBER, code="outerClass", name="outerClass",
                       type_full_name=encl_cls, line=line,
                       ast_parent_type=M.TYPE_DECL,
                       ast_parent_full_name=full,
                       generic_signature=f"L{encl_cls.split('.')[-1]};"))
        for nm in cap_names:
            decl.add(N(M.MEMBER, code=nm, name=nm,
                       type_full_name=captured[nm].type_full_name, line=line,
                       ast_parent_type=M.TYPE_DECL,
                       ast_parent_full_name=full,
                       generic_signature=captured[nm].generic_signature))
        for ctor in decl.children:
            if ctor.kind != M.METHOD or ctor.name != M.CONSTRUCTOR:
                continue
            this = next((c for c in ctor.children
                         if c.kind == M.METHOD_PARAMETER_IN
                         and c.name == "this"), None)
            body = next((c for c in ctor.children if c.kind == M.BLOCK), None)
            if this is None or body is None:
                continue
            n_params = sum(1 for c in ctor.children
                           if c.kind == M.METHOD_PARAMETER_IN)
            new_params: list[N] = []
            assigns: list[N] = []
            ordered = ([("outerClass", encl_cls)]
                       if not is_static and encl_cls else [])
            ordered += [(nm, captured[nm].type_full_name)
                        for nm in cap_names]
            for off, (nm, ty) in enumerate(ordered):
                p = N(M.METHOD_PARAMETER_IN, code=f"{ty} {nm}", name=nm,
                      type_full_name=ty, param_index=n_params + off,
                      line=line, evaluation_strategy=(
                          M.BY_VALUE if ty in JAVA_PRIMITIVES
                          else M.BY_SHARING))
                new_params.append(p)
                this_id = N(M.IDENTIFIER, code="this", name="this",
                            type_full_name=full, arg_index=1, line=line)
                this_id.ref_target = this
                fld = N(M.FIELD_IDENTIFIER, code=nm, name=nm,
                        canonical_name=nm, arg_index=2, line=line)
                fa = N(M.CALL, code=f"this.{nm}", name=M.OP_FIELD_ACCESS,
                       method_full_name=M.OP_FIELD_ACCESS,
                       dispatch_type=M.STATIC_DISPATCH, type_full_name=ty,
                       arg_index=1, line=line)
                fa.add(this_id, fld)
                src = N(M.IDENTIFIER, code=nm, name=nm, type_full_name=ty,
                        arg_index=2, line=line)
                src.ref_target = p
                asg = N(M.CALL, code=f"this.{nm} = {nm}",
                        name=M.OP_ASSIGNMENT,
                        method_full_name=M.OP_ASSIGNMENT,
                        dispatch_type=M.STATIC_DISPATCH, type_full_name=ty,
                        line=line)
                asg.add(fa, src)
                assigns.append(asg)
            # params after the existing ones; assignments first in the body
            insert_at = next((i for i, c in enumerate(ctor.children)
                              if c.kind not in (M.METHOD_PARAMETER_IN,)), 0)
            ctor.children[insert_at:insert_at] = new_params
            # a ctor that delegates via `this(...)` forwards its capture
            # params to the chained ctor instead of re-assigning them
            # (LocalClassTests "local classes with chained explicit
            # constructors": assigns only in non-delegating ctors)
            deleg = next((c for c in body.children
                          if c.kind == M.CALL
                          and (c.name == "this"
                               or (c.name == M.CONSTRUCTOR
                                   and c.code.startswith("this(")))), None)
            if deleg is not None:
                base = max((c.arg_index for c in deleg.children), default=0)
                for off, p in enumerate(new_params, start=1):
                    fwd = N(M.IDENTIFIER, code=p.name, name=p.name,
                            type_full_name=p.type_full_name,
                            arg_index=base + off, line=line)
                    fwd.ref_target = p
                    deleg.add(fwd)
            else:
                body.children[0:0] = assigns
        # `new Local(...)` call sites append the capture arguments after the
        # explicit ones (LocalClassTests "object creation expressions")
        self.local_class_captures[full] = (
            ([("this", encl_cls)] if not is_static and encl_cls else [])
            + [(nm, captured[nm].type_full_name) for nm in cap_names])
        return decl

    def parse_for(self) -> N:
        mark = self._pattern_mark()
        self._cs_marks.append(mark)
        try:
            node = self._parse_for_java()
        finally:
            self._cs_marks.pop()
        if node is not None and node.kind == M.CONTROL_STRUCTURE:
            self._pattern_flow_restore(node, mark)
            # a kept binding was declared inside the for's own (now popped)
            # scope — re-home it in the live scope so it survives the
            # statement (JLS 6.3.1.5; PatternExprTests "a variable is
            # introduced by the for")
            for k in range(mark, len(self.pattern_binds)):
                scope_, name, _prev, _existed, loc = self.pattern_binds[k]
                ns = self.scopes[-1]
                if scope_ is not ns:
                    self.pattern_binds[k] = (ns, name, ns.get(name),
                                             name in ns, loc)
                    ns[name] = loc
        return node

    def _parse_for_java(self) -> N:
        # foreach: for (T x : coll) body
        save = self.pos
        kw = self.peek()
        self.next()
        self.expect("(")
        is_foreach = False
        depth = 1
        k = self.pos
        while k < len(self.toks) and depth > 0:
            v = self.toks[k].v
            if v == "(":
                depth += 1
            elif v == ")":
                depth -= 1
            elif v == ";" and depth == 1:
                break
            elif v == ":" and depth == 1:
                is_foreach = True
                break
            k += 1
        self.pos = save
        if not is_foreach:
            # classic for keeps the reference's full-header code
            # "for (int i = 0; i < c; i++)" (ControlStructureTests:797-799)
            d = 0
            j = save + 1
            close = None
            while j < len(self.toks):
                v = self.toks[j].v
                if v == "(":
                    d += 1
                elif v == ")":
                    d -= 1
                    if d == 0:
                        close = self.toks[j]
                        break
                j += 1
            node = super().parse_for()
            if close is not None and node.kind == M.CONTROL_STRUCTURE:
                open_tok = self.toks[save + 1]
                node.code = f"for ({self.src[open_tok.b:close.a].strip()})"
            return node
        kw_tok = self.next()
        self.expect("(")
        self.push_scope()
        while self.at("final"):
            self.next()
        raw_ty = self.parse_java_type()
        ty = self.resolve_type(raw_ty)
        name_tok = self.next()
        item = name_tok.v
        self.expect(":")
        coll = self.parse_expression()
        self.expect(")")
        line = kw_tok.line
        is_array = ((coll.type_full_name or "").endswith("[]")
                    or coll.name in (M.OP_ARRAY_INITIALIZER, M.OP_ALLOC))

        def mk_ident(nm: str, decl: N | None, tfn: str, arg_index: int = -1) -> N:
            n = N(M.IDENTIFIER, code=nm, name=nm, line=line,
                  type_full_name=tfn, arg_index=arg_index)
            if decl is not None:
                n.ref_target = decl
            return n

        def mk_assign(code: str, lhs: N, rhs: N, tfn: str = M.ANY) -> N:
            lhs.arg_index, rhs.arg_index = 1, 2
            a = N(M.CALL, code=code, name=M.OP_ASSIGNMENT,
                  method_full_name=M.OP_ASSIGNMENT,
                  dispatch_type=M.STATIC_DISPATCH, line=line,
                  type_full_name=tfn)
            a.add(lhs, rhs)
            return a

        prelude: list[N] = []
        # ITERATION SOURCE — the reference copies non-identifier collections
        # (and every iterable) into a fresh `$iterLocalN`
        # (ControlStructureTests.scala:169-228 array-expression form,
        # :540-640 iterator form)
        if is_array and coll.kind == M.IDENTIFIER:
            src = coll.name
            src_decl = getattr(coll, "ref_target", None)
            src_ty = coll.type_full_name or M.ANY
        else:
            src = f"$iterLocal{self.iterlocal_counter}"
            self.iterlocal_counter += 1
            src_ty = (coll.type_full_name if is_array
                      else "java.util.Iterator")
            src_decl = N(M.LOCAL, code=src, name=src,
                         type_full_name=src_ty or M.ANY, line=line,
                         generic_signature=(self.UNSPEC_SIG if is_array
                                            else "Ljava.util.Iterator;"))
            self.declare(src, src_decl)
            prelude.append(src_decl)
            if is_array:
                rhs: N = coll
                rhs_code = coll.code
            else:
                # $iterLocalN = <coll>.iterator() — dynamic member call,
                # receiver = the collection expression (arg 0)
                bt = self.resolve_type(coll.type_full_name or "")
                mfn = (f"{bt}.iterator:java.util.Iterator()"
                       if bt and bt != M.ANY else
                       f"{M.UNRESOLVED_NAMESPACE}.iterator:"
                       f"{M.UNRESOLVED_SIGNATURE}(0)")
                rhs = N(M.CALL, code=f"{coll.code}.iterator()",
                        name="iterator", method_full_name=mfn,
                        dispatch_type=M.DYNAMIC_DISPATCH, line=line,
                        type_full_name="java.util.Iterator")
                coll.role = M.ROLE_RECEIVER
                coll.arg_index = 0
                rhs.add(coll)
                rhs_code = f"{coll.code}.iterator()"
            prelude.append(mk_assign(f"{src} = {rhs_code}",
                                     mk_ident(src, src_decl, src_ty), rhs,
                                     src_ty))

        # array form keeps the declaration code; the iterator form's local is
        # synthesized bare ("item", ControlStructureTests.scala:636-638)
        item_loc = N(M.LOCAL,
                     code=f"{raw_ty} {item}" if is_array else item, name=item,
                     type_full_name=ty, line=name_tok.line,
                     generic_signature=self.sig_of_raw(raw_ty))
        self.declare(item, item_loc)

        if is_array:
            # FOR($idxN local; $idxN = 0; $idxN < src.length; $idxN++)
            # { item local; item = src[$idxN]; body }
            idx = f"$idx{self.idx_counter}"
            self.idx_counter += 1
            idx_loc = N(M.LOCAL, code=idx, name=idx, type_full_name="int",
                        line=line, generic_signature="I")
            self.declare(idx, idx_loc)
            node = N(M.CONTROL_STRUCTURE, code="for",
                     control_structure_type=M.CS_FOR, line=line)
            node.add(idx_loc)
            init = mk_assign(f"{idx} = 0", mk_ident(idx, idx_loc, "int"),
                             N(M.LITERAL, code="0", line=line,
                               type_full_name="int"), "int")
            init.role = M.ROLE_FOR_INIT
            node.add(init)
            size = N(M.CALL, code=f"{src}.length", name=M.OP_SIZEOF,
                     method_full_name=M.OP_SIZEOF,
                     dispatch_type=M.STATIC_DISPATCH, line=line,
                     type_full_name="int", arg_index=2)
            size.add(mk_ident(src, src_decl, src_ty, 1))
            cond = N(M.CALL, code=f"{idx} < {src}.length",
                     name=M.BINARY_OPERATOR_MAP["<"],
                     method_full_name=M.BINARY_OPERATOR_MAP["<"],
                     dispatch_type=M.STATIC_DISPATCH, line=line,
                     type_full_name="boolean", role=M.ROLE_CONDITION)
            cond.add(mk_ident(idx, idx_loc, "int", 1), size)
            node.add(cond)
            upd = N(M.CALL, code=f"{idx}++", name=M.POSTFIX_OPERATOR_MAP["++"],
                    method_full_name=M.POSTFIX_OPERATOR_MAP["++"],
                    dispatch_type=M.STATIC_DISPATCH, line=line,
                    type_full_name="int", role=M.ROLE_FOR_UPDATE)
            upd.add(mk_ident(idx, idx_loc, "int", 1))
            node.add(upd)
            access = N(M.CALL, code=f"{src}[{idx}]", name=self.SUBSCRIPT_OP,
                       method_full_name=self.SUBSCRIPT_OP,
                       dispatch_type=M.STATIC_DISPATCH, line=line,
                       type_full_name=ty)
            access.add(mk_ident(src, src_decl, src_ty, 1),
                       mk_ident(idx, idx_loc, "int", 2))
            item_assign = mk_assign(f"{item} = {src}[{idx}]",
                                    mk_ident(item, item_loc, ty), access, ty)
        else:
            # WHILE ($iterLocalN.hasNext()) { item = $iterLocalN.next(); }
            node = N(M.CONTROL_STRUCTURE, code="while",
                     control_structure_type=M.CS_WHILE, line=line)
            cond = N(M.CALL, code=f"{src}.hasNext()", name="hasNext",
                     method_full_name="java.util.Iterator.hasNext:boolean()",
                     signature="boolean()",
                     dispatch_type=M.DYNAMIC_DISPATCH, line=line,
                     type_full_name="boolean", role=M.ROLE_CONDITION)
            cond.add(mk_ident(src, src_decl, src_ty, 0))
            node.add(cond)
            nxt = N(M.CALL, code=f"{src}.next()", name="next",
                    method_full_name="java.util.Iterator.next:"
                                     "java.lang.Object()",
                    signature="java.lang.Object()",
                    dispatch_type=M.DYNAMIC_DISPATCH, line=line,
                    type_full_name=ty)
            nxt.add(mk_ident(src, src_decl, src_ty, 0))
            item_assign = mk_assign(f"{item} = {src}.next()",
                                    mk_ident(item, item_loc, ty), nxt, ty)
        body = self.as_block(
            self.parse_statement(),
            role=M.ROLE_FOR_BODY if is_array else M.ROLE_WHEN_TRUE,
            line=line)
        body.children[:0] = [item_loc, item_assign]
        node.add(body)
        self.pop_scope()
        if not prelude:
            return node
        wrap = N(M.BLOCK, code="", line=line, type_full_name="void")
        wrap.add(*prelude, node)
        return wrap

    def parse_throw(self) -> N:
        th = self.peek()
        node = super().parse_throw()
        # javasrc keeps the trailing semicolon in the code
        # ("throw ex;", NewControlStructureTests:766-783)
        end = self.toks[self.pos - 1]
        node.code = self.slice(th, end)
        return node

    def skip_explicit_type_args(self) -> None:
        """`f.<Integer, String>foo(0)` — consume the explicit type-argument
        list when a balanced `<...>` is followed by `ident(`
        (GenericsTests.scala:36-51; erasure drops the arguments)."""
        if not self.at("<"):
            return
        k = 1
        depth = 0
        while self.peek(k - 1) is not None:
            v = self.peek(k - 1).v
            if v == "<":
                depth += 1
            elif v == ">":
                depth -= 1
                if depth == 0:
                    break
            elif v in (";", "{", ")"):
                return  # comparison, not type args
            k += 1
        nxt, nxt2 = self.peek(k), self.peek(k + 1)
        if nxt is not None and nxt.t == "id" and nxt2 is not None and nxt2.v == "(":
            self.skip_balanced("<", ">")

    def parse_return(self) -> N:
        # `return switch (x) { ... };` — switch EXPRESSIONS are Java-only
        # (ControlStructureTests.scala:956-967)
        if self.peek(1) is not None and self.peek(1).v == "switch":
            r = self.next()
            self._switch_expr_pos = True
            try:
                sw = self.parse_switch()
            finally:
                self._switch_expr_pos = False
            if self.at(";"):
                self.next()
            end = self.toks[self.pos - 1]
            node = N(M.RETURN, code=self.slice(r, end), line=r.line)
            sw.arg_index = 1
            node.add(sw)
            return node
        node = super().parse_return()
        if node is not None and node.children \
                and node.children[0].kind == M.METHOD_REF \
                and self.method_ret_ctx:
            # `return x -> ...` target-types the lambda from the enclosing
            # method's return type (LambdaTests "returned from a function")
            rty, rtargs = self.method_ret_ctx[-1]
            if rty and rty not in (M.ANY, "void"):
                self._target_type_lambda(node.children[0], rty, rtargs)
        return node

    def parse_switch(self) -> N:
        # arrow-form (switch EXPRESSION) detection: '->' before any ':' at
        # brace depth 1 → MATCH control structure (ControlStructureTests:
        # 956-1027); classic form reuses the C lowering with javasrc's
        # "switch(<sel>)" code spelling (ControlStructureTests:892-894)
        j = self.pos
        depth = 0
        brace = None
        while j < len(self.toks):
            v = self.toks[j].v
            if v == "(":
                depth += 1
            elif v == ")":
                depth -= 1
            elif v == "{" and depth == 0:
                brace = j
                break
            j += 1
        arrow = False
        if brace is not None:
            d = 0
            for k in range(brace, len(self.toks)):
                v = self.toks[k].v
                if v == "{":
                    d += 1
                elif v == "}":
                    d -= 1
                    if d == 0:
                        break
                elif v == "->" and d == 1:
                    arrow = True
                    break
                elif v == ":" and d == 1:
                    break
        if arrow:
            # only value-position switches are MATCH (SwitchExpr →
            # astForSwitchExpr); an arrow-form switch STATEMENT stays a
            # SWITCH with JumpTarget + entry-body children
            # (astForSwitchStatement; PatternExprTests switch sections)
            if getattr(self, "_switch_expr_pos", False):
                return self._parse_arrow_switch()
            return self._parse_arrow_switch_stmt()
        node = super().parse_switch()
        node.code = f"switch({node.children[0].code})"
        return node

    def _record_pattern_ahead(self) -> bool:
        """`Ident[<...>](` in a case label is always a record pattern —
        switch labels are constant expressions, never method calls."""
        t = self.peek()
        if t is None or t.t != "id":
            return False
        k = 1
        while self.at(".", k) and self.peek(k + 1) is not None \
                and self.peek(k + 1).t == "id":
            k += 2
        if self.at("<", k):
            depth = 0
            while self.peek(k) is not None:
                v = self.peek(k).v
                if v == "<":
                    depth += 1
                elif v == ">":
                    depth -= 1
                    if depth == 0:
                        k += 1
                        break
                elif v in (";", "{", "->"):
                    return False
                k += 1
        return self.at("(", k)

    def _parse_arrow_switch_stmt(self) -> N:
        """Arrow-form switch STATEMENT (AstForSimpleStatementsCreator
        .astForSwitch:198-202 / astForSwitchEntry:280-333): SWITCH control
        structure whose body block holds, per entry, the JUMP_TARGETs (plus
        non-pattern label expressions) and an entry body. A pattern label
        lowers to `if (<selector instanceof-pattern lowering>) { stmts }`
        with the pattern locals at the start of the ENTRY block and a
        `when` guard as a nested if (PatternExprTests:2366-3044)."""
        kw = self.next()
        self.expect("(")
        sel = self.parse_expression()
        self.expect(")")
        node = N(M.CONTROL_STRUCTURE, code=f"switch({sel.code})",
                 control_structure_type=M.CS_SWITCH, line=kw.line)
        # selector dedup: pattern entries re-reference it via copies
        # (astForSwitchSelector:204-228 initAndRefAstsForPatternInitializer)
        src = self._init_ref_source(sel)
        sel_child = src["get"]()
        sel_child.role = M.ROLE_CONDITION
        node.add(sel_child)
        open_tok = self.expect("{")
        body = N(M.BLOCK, code="", line=open_tok.line, type_full_name="void")
        self.push_scope()
        while self.peek() is not None and not self.at("}"):
            t = self.peek()
            if t.v not in ("case", "default"):
                self.next()
                continue
            pattern = None
            guard = None
            targets: list[N] = []
            label_exprs: list[N] = []
            while self.peek() is not None and self.peek().v in ("case",
                                                                "default"):
                c = self.next()
                if c.v == "default":
                    targets.append(N(M.JUMP_TARGET, code="default",
                                     name="default", line=c.line))
                else:
                    lstart = self.peek()
                    save = self.pos
                    if self.looks_like_java_type() \
                            or self._record_pattern_ahead():
                        raw_ty = self.parse_java_type()
                        nxt = self.peek()
                        if (nxt is not None and nxt.t == "id"
                                and nxt.v != "when") or self.at("("):
                            pattern = self._parse_pattern(
                                raw_ty, self.resolve_type(raw_ty), c.line)
                        else:
                            self.pos = save
                    if pattern is None:
                        label_exprs.append(self.parse_assignment_expr())
                    lend = self.toks[self.pos - 1]
                    targets.append(N(M.JUMP_TARGET,
                                     code=self.src[lstart.a:lend.b].strip(),
                                     name="case", line=c.line))
                if self.at(","):
                    self.next()
            bmark = self._pattern_mark()
            frame = None
            iof = None
            if pattern is not None:
                # hoisted pattern locals land at the entry-block start
                # (getAndClearUnaddedPatternLocals, astForSwitchEntry:320)
                frame = self._push_pattern_frame("entry")
                self.block_pattern_names.append({})
                try:
                    iof = self._instanceof_pattern(src["get"](), pattern)
                finally:
                    pass
            if self.peek() is not None and self.peek().t == "id" \
                    and self.peek().v == "when":
                self.next()
                guard = self.parse_expression()
            if self.at("->"):
                self.next()
            if self.at("{"):
                inner = self.parse_compound()
                inner.type_full_name = "void"
            else:
                inner = N(M.BLOCK, code="", line=c.line,
                          type_full_name="void")
                stmt = self.parse_statement() \
                    if self.peek() is not None and self.peek().t == "kw" \
                    and self.peek().v in ("return", "throw", "break",
                                          "continue", "if", "while", "for",
                                          "do", "try", "switch") \
                    else None
                if stmt is not None:
                    inner.add(*stmt)
                else:
                    expr = self.parse_expression()
                    if expr is not None:
                        inner.add(expr)
                if self.at(";"):
                    self.next()
            if guard is not None:
                guard.role = M.ROLE_CONDITION
                inner.role = M.ROLE_WHEN_TRUE
                gif = N(M.CONTROL_STRUCTURE, code=f"if ({guard.code})",
                        control_structure_type=M.CS_IF, line=guard.line)
                gif.add(guard, inner)
                inner = gif
            if iof is not None:
                iof.role = M.ROLE_CONDITION
                if inner.kind == M.BLOCK:
                    inner.role = M.ROLE_WHEN_TRUE
                else:
                    blk = N(M.BLOCK, code="", line=iof.line,
                            type_full_name="void", role=M.ROLE_WHEN_TRUE)
                    blk.add(inner)
                    inner = blk
                pif = N(M.CONTROL_STRUCTURE, code=f"if ({iof.code})",
                        control_structure_type=M.CS_IF, line=iof.line)
                pif.add(iof, inner)
                inner = pif
            if frame is not None:
                self.block_pattern_names.pop()
                entry = N(M.BLOCK, code="", line=c.line,
                          type_full_name="void")
                self._pop_pattern_frame(frame, entry)
                entry.add(inner)
                inner = entry
                self._pattern_restore(bmark)
            body.add(*targets, *label_exprs, inner)
        if self.at("}"):
            self.next()
        self.pop_scope()
        body.role = M.ROLE_WHEN_TRUE
        node.add(body)
        return node

    def _parse_arrow_switch(self) -> N:
        """switch expression with `case X -> result;` arms → MATCH control
        structure: body children are JUMP_TARGET("case", <label>), the label
        literal, then the result expression per arm; `default ->` contributes
        JUMP_TARGET("default") + result (ControlStructureTests.scala:969-1026)."""
        kw = self.next()
        self.expect("(")
        sel = self.parse_expression()
        self.expect(")")
        node = N(M.CONTROL_STRUCTURE, code=f"switch({sel.code})",
                 control_structure_type=M.CS_MATCH, line=kw.line)
        sel.role = M.ROLE_CONDITION
        node.add(sel)
        open_tok = self.expect("{")
        body = N(M.BLOCK, code="", line=open_tok.line, type_full_name="void")
        self.push_scope()
        while self.peek() is not None and not self.at("}"):
            if self.at("case"):
                c = self.next()
                lstart = self.peek()
                while self.peek() is not None and not self.at("->"):
                    self.next()
                lend = self.toks[self.pos - 1]
                label = self.src[lstart.a:lend.b].strip() if lstart is not None else ""
                body.add(N(M.JUMP_TARGET, code=label, name="case", line=c.line))
                body.add(N(M.LITERAL, code=label, line=c.line))
            elif self.at("default"):
                d = self.next()
                while self.peek() is not None and not self.at("->"):
                    self.next()
                body.add(N(M.JUMP_TARGET, code="default", name="default",
                           line=d.line))
            else:
                self.next()
                continue
            if self.at("->"):
                self.next()
            if self.at("{"):
                body.add(self.parse_compound())
            else:
                expr = self.parse_expression()
                if expr is not None:
                    body.add(expr)
                if self.at(";"):
                    self.next()
        if self.at("}"):
            self.next()
        self.pop_scope()
        body.role = M.ROLE_WHEN_TRUE
        node.add(body)
        return node

    def parse_try(self) -> N:
        kw = self.next()
        node = N(M.CONTROL_STRUCTURE, code="try", control_structure_type=M.CS_TRY, line=kw.line)
        twr_prelude: list[N] = []
        twr_scope = False
        if self.at("("):  # try-with-resources
            self.next()
            self.push_scope()
            twr_scope = True
            while not self.at(")"):
                if self.looks_like_java_type():
                    raw_ty = self.parse_java_type()
                    sig_raw = self.last_raw_type
                    ty = self.resolve_type(raw_ty)
                    if self.peek() is not None and self.peek().t == "id":
                        nm = self.next()
                        # resources hoist BEFORE the try as sibling LOCAL +
                        # assignment statements; code keeps the raw spelling
                        # ("FileReader fr", NewControlStructureTests:70-122)
                        loc = N(M.LOCAL, code=f"{raw_ty} {nm.v}", name=nm.v,
                                type_full_name=ty, line=nm.line,
                                generic_signature=self.sig_of_raw(sig_raw))
                        twr_prelude.append(loc)
                        self.declare(nm.v, loc)
                        if self.at("="):
                            self.next()
                            init = self.parse_assignment_expr()
                            ident = N(M.IDENTIFIER, code=nm.v, name=nm.v,
                                      type_full_name=ty, line=nm.line,
                                      arg_index=1)
                            ident.ref_target = loc
                            init.arg_index = 2
                            asg = N(M.CALL, code=f"{nm.v} = {init.code}",
                                    name=M.OP_ASSIGNMENT,
                                    method_full_name=M.OP_ASSIGNMENT,
                                    dispatch_type=M.STATIC_DISPATCH,
                                    type_full_name=ty, line=nm.line)
                            asg.add(ident, init)
                            twr_prelude.append(asg)
                if self.at(";"):
                    self.next()
                elif not self.at(")"):
                    self.next()
            self.next()
        body = self.parse_compound()
        body.role = M.ROLE_TRY_BODY
        node.add(body)
        if twr_scope:
            # resources are scoped to the try block (JLS 14.20.3) — a
            # same-named outer field is visible again afterwards
            # (CapturingTests "TryStmt with resources shadowing a field")
            self.pop_scope()
        while self.at("catch"):
            c = self.next()
            catch = N(M.CONTROL_STRUCTURE, code="catch", control_structure_type=M.CS_CATCH,
                      role=M.ROLE_CATCH_BODY, line=c.line)
            self.push_scope()
            self.expect("(")
            while self.at("final"):
                self.next()
            ty = self.resolve_type(self.parse_java_type())
            while self.at("|"):  # multi-catch
                self.next()
                self.parse_java_type()
            if self.peek() is not None and self.peek().t == "id":
                pn = self.next()
                loc = N(M.LOCAL, code=f"{ty} {pn.v}", name=pn.v,
                        type_full_name=ty, line=pn.line)
                catch.add(loc)
                self.declare(pn.v, loc)
            self.expect(")")
            catch.add(self.parse_compound())
            self.pop_scope()
            node.add(catch)
        if self.at("finally"):
            f = self.next()
            fin = N(M.CONTROL_STRUCTURE, code="finally", control_structure_type=M.CS_FINALLY,
                    role=M.ROLE_FINALLY_BODY, line=f.line)
            fin.add(self.parse_compound())
            node.add(fin)
        # resources surface as SIBLING statements before the try — the
        # enclosing parse_statement drains this immediately (nested tries
        # are safe: each parse_try overwrites the attr just before return)
        self._twr_prelude = twr_prelude
        return node

    def looks_like_type(self) -> bool:
        # reuse statement-level declaration detection with Java shapes
        t = self.peek()
        if t is None:
            return False
        if t.t == "kw" and t.v in JAVA_TYPE_KEYWORDS:
            return True
        return self.looks_like_java_type()

    def try_parse_declaration(self, consume_semi: bool = True):
        """`final T x = e, y;` → [LOCAL x, CALL x = e, LOCAL y]."""
        start = self.peek()
        while self.at("final"):
            self.next()
        raw_ty = self.parse_java_type()
        decl_sig_raw = self.last_raw_type
        decl_targs = self.last_type_args  # `Function<String, String> f`
        base_ty = self.resolve_type(raw_ty)
        if self.peek() is None or self.peek().t != "id":
            return None
        out: list[N] = []
        while True:
            if self.peek() is None or self.peek().t != "id":
                return None
            name_tok = self.next()
            name = name_tok.v
            ty = base_ty
            code_ty = raw_ty  # LOCAL/assignment codes keep the SOURCE type
            # spelling ("Integer y", not "java.lang.Integer y") while
            # typeFullName resolves — LocalTests.scala:22-27
            post_dims = 0
            while self.at("[") and self.at("]", 1):
                self.next(); self.next()
                ty += "[]"
                code_ty += "[]"
                post_dims += 1
            # a vardecl clashing with a LIVE hoisted pattern local of the
            # same (name, type) SHARES that local (PatternExprTests "a
            # pattern and local variable share a name and a type"); a
            # clashing different-type vardecl mangles to `name$K`
            # (AstForVarDeclAndAssignsCreator.scala:144)
            shared = self._live_pattern_local(name, ty)
            if shared is not None:
                mangled = shared.name
                loc = shared
            else:
                mangled = self._mangled_pattern_name(name)
                loc = N(M.LOCAL, code=f"{code_ty} {name}", name=mangled,
                        type_full_name=ty, line=name_tok.line,
                        generic_signature=("[" * post_dims
                                           + self.sig_of_raw(decl_sig_raw)))
                out.append(loc)
            self.declare(name, loc)
            if self.at("="):
                self.next()
                # bare `{0, 1, 2}` initializer (no `new T[]` prefix) is the
                # arrayInitializer call itself — ArrayTests.scala:56-78
                if self.at("{"):
                    init = self.parse_array_initializer(ty)
                else:
                    init = self.parse_assignment_expr()
                self.note_init_dynamic_type(loc, init)
                if init.kind == M.METHOD_REF:
                    # `Function<String, String> f = x -> ...` target-types
                    # the lambda (LambdaTests "assigned to a variable")
                    self._target_type_lambda(init, ty, decl_targs)
                if decl_targs:
                    self.decl_targs[id(loc)] = decl_targs
                ident = N(M.IDENTIFIER, code=mangled, name=mangled,
                          type_full_name=ty,
                          line=name_tok.line, arg_index=1)
                ident.ref_target = loc
                init.arg_index = 2
                # combined declarator+init assignment code keeps the declared
                # type prefix ("int x = 1"), a plain re-assignment stays
                # "x = 1" — VarDeclTests.scala:29,52
                call = N(M.CALL, code=f"{code_ty} {name} = {init.code}",
                         name=M.OP_ASSIGNMENT,
                         method_full_name=M.OP_ASSIGNMENT,
                         dispatch_type=M.STATIC_DISPATCH, type_full_name=ty,
                         line=name_tok.line)
                call.add(ident, init)
                out.append(call)
            if self.at(","):
                self.next()
                continue
            break
        if consume_semi:
            if not self.at(";"):
                return None
            self.next()
        return out

    # ---------------- expressions: Java deltas ----------------
    def _propagate_pattern_sets(self, call: N, op: str, lhs: N, rhs: N) -> None:
        """JLS 6.3: `a && b` introduces-when-true the union of both sides;
        `a || b` introduces-when-false the union (the eager scope declare
        already made LHS bindings visible while RHS parsed)."""
        lt, lf = self._expr_pattern_sets(lhs)
        rt, rf = self._expr_pattern_sets(rhs)
        if not (lt or lf or rt or rf):
            return
        if op == "&&":
            self.expr_patterns[id(call)] = ({**lt, **rt}, {})
        else:
            self.expr_patterns[id(call)] = ({}, {**lf, **rf})

    def parse_unary(self) -> N:
        node = self._parse_unary_java()
        if node is not None and node.kind == M.CALL \
                and node.name == M.OP_LOGICAL_NOT and node.children:
            t, f = self._expr_pattern_sets(node.children[0])
            if t or f:  # `!` swaps the flow-scope sets (JLS 6.3.2.3)
                self.expr_patterns[id(node)] = (f, t)
        return node

    def _parse_unary_java(self) -> N:
        t = self.peek()
        if t is None:
            raise ParseError("EOF in expression")
        if t.v == "new":
            # postfix chains continue off the construction
            # (`new Thread(...).start()`)
            return self.parse_postfix_ops(self.parse_new(), t)
        # lambda `(a, b) -> expr` or `x -> expr`
        if t.v == "(" or t.t == "id":
            k = self.pos
            if t.v == "(":
                depth = 0
                while k < len(self.toks):
                    v = self.toks[k].v
                    if v == "(":
                        depth += 1
                    elif v == ")":
                        depth -= 1
                        if depth == 0:
                            break
                    k += 1
                if k + 1 < len(self.toks) and self.toks[k + 1].v == "->":
                    return self.parse_lambda()
            elif self.at("->", 1):
                return self.parse_lambda()
        if t.v == "(":
            # Java cast: (Type) expr
            save = self.pos
            self.next()
            if self.looks_like_cast_type():
                ty = self.resolve_type(self.parse_java_type())
                if self.at(")"):
                    self.next()
                    nxt = self.peek()
                    if nxt is not None and (nxt.t in ("id", "num", "str", "char")
                                           or nxt.v in ("(", "!", "~", "this", "new")):
                        operand = self.parse_unary()
                        end = self.toks[self.pos - 1]
                        tref = N(M.TYPE_REF, code=ty, type_full_name=ty, line=t.line, arg_index=1)
                        operand.arg_index = 2
                        call = N(M.CALL, code=self.slice(t, end), name=M.OP_CAST,
                                 method_full_name=M.OP_CAST, dispatch_type=M.STATIC_DISPATCH,
                                 line=t.line, type_full_name=ty)
                        call.add(tref, operand)
                        return call
            self.pos = save
        return super().parse_unary()

    def looks_like_cast_type(self) -> bool:
        t = self.peek()
        if t is None:
            return False
        if t.t == "kw" and t.v in JAVA_TYPE_KEYWORDS:
            return True
        if t.t != "id":
            return False
        # (Ident) expr — only treat as cast for known/imported/declared types
        base = t.v
        return base in self.declared_types or base in self.imports or base in JAVA_LANG

    def parse_assignment_expr(self) -> N:
        node = super().parse_assignment_expr()
        if node is not None and node.kind == M.CALL \
                and node.name == M.OP_ASSIGNMENT and len(node.children) == 2:
            lhs, rhs = node.children
            if rhs.kind == M.METHOD_REF \
                    and lhs.type_full_name not in ("", M.ANY, None):
                # `mapper = x -> ...` target-types the lambda from the
                # assignee's declared type (LambdaTests "reassigned")
                d = getattr(lhs, "ref_target", None)
                self._target_type_lambda(
                    rhs, lhs.type_full_name,
                    self.decl_targs.get(id(d)) if d is not None else None)
        return node

    def parse_binary(self, min_prec: int) -> N:
        start_tok = self.peek()
        lhs = super().parse_binary(min_prec)
        while self.at("instanceof"):
            op = self.next()
            while self.at("final"):
                self.next()
            raw_ty = self.parse_java_type()
            ty = self.resolve_type(raw_ty)
            nxt = self.peek()
            if (nxt is not None and nxt.t == "id") or self.at("("):
                # Java 16+ pattern: `o instanceof T t` / record pattern
                # `o instanceof R(...)` lowers to
                # `(o instanceof T) && { t = (T) o; true; }`
                # (AstForPatternExpressionsCreator.scala:199-216,
                # PatternExprTests.scala throughout)
                pattern = self._parse_pattern(raw_ty, ty, op.line)
                lhs = self._instanceof_pattern(lhs, pattern)
            else:
                # code keeps the raw source spelling; the TYPE_REF carries
                # the resolved fullname (SpecialOperatorTests instanceOf)
                tref = N(M.TYPE_REF, code=raw_ty, type_full_name=ty,
                         line=op.line, arg_index=2)
                lhs.arg_index = 1
                call = N(M.CALL, code=f"{lhs.code} instanceof {raw_ty}",
                         name=M.OP_INSTANCE_OF,
                         method_full_name=M.OP_INSTANCE_OF,
                         dispatch_type=M.STATIC_DISPATCH,
                         line=op.line, type_full_name="boolean")
                call.add(lhs, tref)
                lhs = call
            # resume climbing: everything binding looser than instanceof
            # (==, &, ^, |, &&, ||) still belongs to this expression —
            # `foo() instanceof String s && s.isEmpty()` (PatternExprTests
            # "a pattern matching instanceof with a call lhs")
            lhs = self._binary_climb(lhs, start_tok, min_prec)
        return lhs

    # ---------------- Java 16+ pattern-expression lowering ----------------
    # Semantics source: javasrc2cpg AstForPatternExpressionsCreator.scala
    # (init/ref dedup :61-105, castAstIfNecessary :107-128, type-pattern
    # assignments :129-183, assignment block :185-197, instanceof-and
    # :199-216, type-check fold :218-268, record field accessors :270-310,
    # buildInstanceOfAst :312-340) asserted by PatternExprTests.scala.

    def _push_pattern_frame(self, kind: str = "method") -> dict:
        """kind: "method"/"lambda" frames own the per-method `$K` pool
        (MethodScope.mangledNameIdxKeyPool); "entry" (switch case) and
        "lambda" frames CAPTURE locals hoisted at their own statement depth
        (entry-block / lambda-body placement); "method" frames never
        capture — statement-level locals drain via pending_pattern_locals
        immediately before the introducing statement (astsForStatement:79-84,
        astsForIf/While/Do patternLocals :+ ast)."""
        frame = {"sink": [], "mangle": 0, "kind": kind,
                 "depth": self._stmt_depth}
        self.pattern_frames.append(frame)
        return frame

    def _pop_pattern_frame(self, frame: dict, body: N | None) -> None:
        self.pattern_frames.pop()
        if body is not None and frame["sink"]:
            body.children[:0] = frame["sink"]

    def _hoist_pattern_local(self, loc: N) -> None:
        f = self.pattern_frames[-1] if self.pattern_frames else None
        if f is not None and f["kind"] in ("entry", "lambda") \
                and f["depth"] == self._stmt_depth:
            f["sink"].append(loc)
        else:
            # placed immediately before the enclosing statement by the
            # parse_statement drain (patternVariableAsts ++ statementAsts)
            self.pending_pattern_locals.append(loc)

    def parse_compound(self) -> N:
        # per-block hoisted-pattern-local table (name, type) -> LOCAL:
        # reuse and mangling only consult LIVE blocks (Scope
        # .getHoistedPatternLocals collects from the scope stack's
        # BlockScopes), so a pattern in a closed sibling block does not
        # mangle later vardecls (PatternExprTests "a local is defined in
        # a sibling block")
        self.block_pattern_names.append({})
        try:
            return super().parse_compound()
        finally:
            self.block_pattern_names.pop()

    def _live_pattern_local(self, name: str, ty: str) -> N | None:
        """Live hoisted pattern local with this (name, type), if any
        (AstForPatternExpressionsCreator:146-151 reuse lookup)."""
        for d in reversed(self.block_pattern_names):
            loc = d.get((name, ty))
            if loc is not None:
                return loc
        return None

    def _pattern_name_live(self, name: str) -> bool:
        return any(k[0] == name for d in self.block_pattern_names for k in d)

    def _mangled_pattern_name(self, name: str) -> str:
        """`name$K` when a hoisted pattern local with `name` is live in an
        enclosing block (Scope.getMangledName:334-341); the `$K` pool is
        per-method (JavaScopeElement.mangleLocalName:171-173)."""
        if not self._pattern_name_live(name):
            return name
        frame = next((f for f in reversed(self.pattern_frames)
                      if f["kind"] != "entry"), None)
        if frame is None:
            return name
        mangled = f"{name}${frame['mangle']}"
        frame["mangle"] += 1
        return mangled

    def _is_resolved_ty(self, ty: str) -> bool:
        return (bool(ty) and ty != M.ANY
                and not ty.startswith(M.UNRESOLVED_NAMESPACE))

    def _pattern_ty(self, raw: str) -> str:
        """Pattern types fall back to ANY when unresolvable
        (PatternExprTests "type pattern without an import fallback")."""
        ty = self.resolve_type(raw)
        if ty != raw or "." in ty or ty in JAVA_PRIMITIVES:
            return ty
        base = raw.split("<", 1)[0].rstrip("[]")
        if base in self.declared_types or base in self.imports \
                or base in JAVA_LANG:
            return ty
        return M.ANY

    def _copy_tree(self, n: N) -> N:
        c = N(n.kind, code=n.code, name=n.name, line=n.line)
        for attr in ("full_name", "signature", "arg_index", "role",
                     "dispatch_type", "type_full_name", "method_full_name",
                     "control_structure_type", "jump_label", "canonical_name",
                     "evaluation_strategy", "param_index", "line_end",
                     "ref_target"):
            setattr(c, attr, getattr(n, attr))
        c.children = [self._copy_tree(ch) for ch in n.children]
        return c

    def _parse_pattern(self, raw_ty: str, ty: str, line: int) -> dict:
        if self.at("("):  # record pattern R(...)
            self.next()
            comps: list[dict] = []
            while self.peek() is not None and not self.at(")"):
                comps.append(self._parse_component_pattern(line))
                if self.at(","):
                    self.next()
            self.expect(")")
            return {"kind": "record", "raw": raw_ty,
                    "ty": self._pattern_ty(raw_ty),
                    "comps": comps, "line": line}
        tok = self.next()
        return {"kind": "type", "raw": raw_ty, "ty": self._pattern_ty(raw_ty),
                "name": tok.v, "line": tok.line}

    def _parse_component_pattern(self, line: int) -> dict:
        t = self.peek()
        if t is not None and t.v == "_":  # match-all
            self.next()
            return {"kind": "any"}
        raw = self.parse_java_type()
        nxt = self.peek()
        if self.at("("):
            return self._parse_pattern(raw, self._pattern_ty(raw), line)
        if nxt is not None and nxt.t == "id":
            if nxt.v == "_":  # typed match-all `Foo _`
                self.next()
                return {"kind": "any"}
            tok = self.next()
            ty = "" if raw == "var" else self._pattern_ty(raw)
            return {"kind": "type", "raw": raw, "ty": ty, "name": tok.v,
                    "line": tok.line}
        return {"kind": "any"}

    def _init_ref_source(self, node: N):
        """PatternInitAndRefAsts: dedupe a possibly-effectful value so it
        is initialized exactly once. Identifier/fieldAccess roots copy;
        anything else routes through a hoisted `$objN` temp
        (AstForPatternExpressionsCreator.scala:61-105)."""
        if node.kind == M.IDENTIFIER or (node.kind == M.CALL
                                         and node.name == M.OP_FIELD_ACCESS):
            state = {"used": False}

            def get() -> N:
                if not state["used"]:
                    state["used"] = True
                    return node
                return self._copy_tree(node)
            return {"get": get, "static_ty": node.type_full_name}
        ty = node.type_full_name
        if (not ty or ty == M.ANY) and node.kind == M.CALL \
                and node.method_full_name and ":" in node.method_full_name:
            # static expression type from the resolved callee's return type
            # ("$obj0" local typed java.lang.String, PatternExprTests
            # "a pattern matching instanceof with a call lhs")
            sig = node.method_full_name.rsplit(":", 1)[1]
            ret = sig.split("(", 1)[0]
            if self._is_resolved_ty(ret) and ret != M.UNRESOLVED_SIGNATURE:
                ty = ret
                node.type_full_name = ret  # fooCall.typeFullName asserted
        if not ty:
            # rootType.getOrElse(Object) — an unresolved "ANY" stays ANY
            # (PatternExprTests "the pattern is a nested record pattern")
            ty = "java.lang.Object"
        name = f"$obj{self.temp_obj_n}"
        self.temp_obj_n += 1
        # the tmp's static type depends on the initializer's (unresolvable in
        # general) type -> L__unspecified_type; (GenericSignatureTests
        # "a pattern initializer requiring a tmp local")
        loc = N(M.LOCAL, code=name, name=name, type_full_name=ty,
                line=node.line, generic_signature=self.UNSPEC_SIG)
        self._hoist_pattern_local(loc)

        def mk_ident() -> N:
            ident = N(M.IDENTIFIER, code=name, name=name,
                      type_full_name=ty, line=node.line)
            ident.ref_target = loc
            return ident

        state = {"used": False}

        def get() -> N:
            if not state["used"]:
                state["used"] = True
                ident = mk_ident()
                ident.arg_index = 1
                node.arg_index = 2
                assign = N(M.CALL, code=f"{name} = {node.code}",
                           name=M.OP_ASSIGNMENT,
                           method_full_name=M.OP_ASSIGNMENT,
                           dispatch_type=M.STATIC_DISPATCH,
                           line=node.line, type_full_name=ty)
                assign.add(ident, node)
                return assign
            return mk_ident()
        return {"get": get, "static_ty": ty}

    def _cast_if_needed(self, value: N, target_ty: str, raw: str,
                        line: int) -> N:
        if self._is_resolved_ty(target_ty) \
                and value.type_full_name == target_ty:
            return value
        raw_base = raw.split("<", 1)[0]
        tref = N(M.TYPE_REF, code=raw_base, type_full_name=target_ty,
                 line=line, arg_index=1)
        value.arg_index = 2
        cast = N(M.CALL, code=f"({raw_base}) {value.code}", name=M.OP_CAST,
                 method_full_name=M.OP_CAST, dispatch_type=M.STATIC_DISPATCH,
                 line=line, type_full_name=target_ty)
        cast.add(tref, value)
        return cast

    def _field_init_source(self, parent_src: dict, parent_raw: str,
                           parent_ty: str, field_name: str, field_ty: str,
                           needs_tmp: bool, line: int):
        """Lazy accessor-call source for one record component: first `get`
        materializes `((R) parent).field()` (through a `$objN` temp when
        the value is re-checked or re-typed), later gets return the ref
        (AstForPatternExpressionsCreator PatternInitNode)."""
        state: dict = {}

        def get() -> N:
            if "getter" not in state:
                parent_ast = parent_src["get"]()
                lhs = self._cast_if_needed(parent_ast, parent_ty,
                                           parent_raw, line)
                owner = (parent_ty if self._is_resolved_ty(parent_ty)
                         else f"{M.UNRESOLVED_NAMESPACE}.{parent_raw}")
                ret_ty = field_ty if field_ty else M.ANY
                # unresolvable component accessors carry the unresolved
                # signature: <unresolvedNamespace>.Bar.<unknownField>:
                # <unresolvedSignature>(0) (PatternExprTests:3254-3257)
                sig = (f"{ret_ty}()" if field_name != M.UNKNOWN_FIELD
                       else f"{M.UNRESOLVED_SIGNATURE}(0)")
                prefix = (f"({lhs.code})"
                          if lhs.kind == M.CALL and lhs.name.startswith("<operator")
                          else lhs.code)
                call = N(M.CALL, code=f"{prefix}.{field_name}()",
                         name=field_name,
                         method_full_name=f"{owner}.{field_name}:{sig}",
                         dispatch_type=M.DYNAMIC_DISPATCH,
                         signature=sig,
                         line=line, type_full_name=ret_ty)
                lhs.role = M.ROLE_RECEIVER
                lhs.arg_index = 0
                call.add(lhs)
                if needs_tmp:
                    state["getter"] = self._init_ref_source(call)["get"]
                else:
                    inner = {"used": False}

                    def g() -> N:
                        if not inner["used"]:
                            inner["used"] = True
                            return call
                        return self._copy_tree(call)
                    state["getter"] = g
            return state["getter"]()
        return {"get": get, "static_ty": field_ty or M.ANY}

    def _pattern_check(self, pat: dict, src: dict, is_root: bool,
                       buffer: list) -> N | None:
        pat_ty = pat["ty"]
        need_iof = (is_root or not self._is_resolved_ty(pat_ty)
                    or src["static_ty"] != pat_ty)
        iof = None
        if need_iof:
            value = src["get"]()
            lhs_code = (value.code
                        if value.kind == M.IDENTIFIER
                        or (value.kind == M.CALL
                            and value.name == M.OP_FIELD_ACCESS)
                        else f"({value.code})")
            raw_base = pat["raw"].split("<", 1)[0]
            tref = N(M.TYPE_REF, code=raw_base, type_full_name=pat_ty,
                     line=pat["line"], arg_index=2)
            value.arg_index = 1
            iof = N(M.CALL, code=f"{lhs_code} instanceof {raw_base}",
                    name=M.OP_INSTANCE_OF,
                    method_full_name=M.OP_INSTANCE_OF,
                    dispatch_type=M.STATIC_DISPATCH,
                    line=pat["line"], type_full_name="boolean")
            iof.add(value, tref)
        if pat["kind"] == "type":
            return iof
        # record pattern: accessor sources per component, nested checks
        comps_decl = self.record_components.get(pat_ty, [])
        checks: list[N] = [iof] if iof is not None else []
        for i, comp in enumerate(pat["comps"]):
            if comp["kind"] == "any":
                continue
            if i < len(comps_decl):
                _, field_ty, field_name, _ = comps_decl[i]
            else:
                field_ty, field_name = M.ANY, M.UNKNOWN_FIELD
            if comp["kind"] == "type" and comp["raw"] == "var":
                comp["ty"] = field_ty  # `var` adopts the component type
            comp_ty = comp["ty"]
            branching = (comp["kind"] == "record"
                         and len(comp["comps"]) > 1)
            needs_tmp = (branching or not self._is_resolved_ty(comp_ty)
                         or comp_ty != field_ty)
            child_src = self._field_init_source(
                src, pat["raw"].split("<", 1)[0], pat_ty, field_name,
                field_ty, needs_tmp, comp.get("line", pat["line"]))
            if comp["kind"] == "type":
                buffer.append((comp, child_src))
            c = self._pattern_check(comp, child_src, False, buffer)
            if c is not None:
                checks.append(c)
        if not checks:
            return None
        checks.reverse()
        acc = checks[0]
        for nxt in checks[1:]:
            nxt.arg_index, acc.arg_index = 1, 2
            node = N(M.CALL, code=f"({nxt.code}) && ({acc.code})",
                     name=M.OP_LOGICAL_AND,
                     method_full_name=M.OP_LOGICAL_AND,
                     dispatch_type=M.STATIC_DISPATCH,
                     line=pat["line"], type_full_name="boolean")
            node.add(nxt, acc)
            acc = node
        return acc

    def _pattern_assign(self, pat: dict, src: dict) -> tuple[N, N]:
        """One `{ name = (T) value }` assignment; creates (or reuses) the
        hoisted LOCAL first so hoist order matches the reference
        (createAssignmentForTypePattern)."""
        name = pat["name"]
        var_ty = pat["ty"] if pat["ty"] else M.ANY
        loc = self._live_pattern_local(name, var_ty)
        if loc is None:
            mangled = self._mangled_pattern_name(name)
            loc = N(M.LOCAL, code=f"{pat['raw']} {name}", name=mangled,
                    type_full_name=var_ty, line=pat["line"],
                    generic_signature=self.sig_of_raw(pat["raw"]))
            self._hoist_pattern_local(loc)
            if self.block_pattern_names:
                self.block_pattern_names[-1][(name, var_ty)] = loc
        ident = N(M.IDENTIFIER, code=loc.name, name=loc.name,
                  type_full_name=var_ty, line=pat["line"], arg_index=1)
        ident.ref_target = loc
        rhs = self._cast_if_needed(src["get"](), var_ty, pat["raw"],
                                   pat["line"])
        rhs.arg_index = 2
        assign = N(M.CALL, code=f"{name} = {rhs.code}",
                   name=M.OP_ASSIGNMENT, method_full_name=M.OP_ASSIGNMENT,
                   dispatch_type=M.STATIC_DISPATCH,
                   line=pat["line"], type_full_name=var_ty)
        assign.add(ident, rhs)
        return assign, loc

    def _declare_pattern_var(self, name: str, loc: N) -> None:
        scope = self.scopes[-1]
        self.pattern_binds.append(
            (scope, name, scope.get(name), name in scope, loc))
        scope[name] = loc

    def _pattern_mark(self) -> int:
        return len(self.pattern_binds)

    def _pattern_restore(self, mark: int, keep_locs: set | frozenset = frozenset()) -> None:
        """Undo eager pattern-variable declarations made since `mark`,
        except bindings whose LOCAL is flow-scope-kept ("introduced by the
        statement", JLS 6.3 / partitionPatternAstsByScope). Kept bindings
        stay on the stack so an ENCLOSING statement can still restore them."""
        binds = self.pattern_binds[mark:]
        del self.pattern_binds[mark:]
        for rec in binds:
            scope, name, prev, existed, loc = rec
            if id(loc) in keep_locs:
                self.pattern_binds.append(rec)
                continue
            if scope.get(name) is not loc:
                continue  # re-shadowed later; leave as-is
            if existed:
                scope[name] = prev
            else:
                scope.pop(name, None)

    def _expr_pattern_sets(self, node: N | None) -> tuple[dict, dict]:
        if node is None:
            return {}, {}
        return self.expr_patterns.get(id(node), ({}, {}))

    def _cant_complete_normally(self, node: N | None) -> bool:
        """Approximate JLS 14.22: the branch ends in return/throw/
        break/continue on every path we bother to check (the last child)."""
        if node is None:
            return False
        if node.kind == M.RETURN:
            return True
        if node.kind == M.CONTROL_STRUCTURE and node.control_structure_type \
                in (M.CS_THROW, M.CS_BREAK, M.CS_CONTINUE):
            return True
        if node.kind == M.BLOCK and node.children:
            return self._cant_complete_normally(node.children[-1])
        return False

    def _pattern_flow_restore(self, node: N, mark: int) -> None:
        """After an if/while/do/for parses, decide which pattern bindings
        outlive the statement (JLS 6.3; partitionPatternAstsByScope):
        loop-condition false-sets always; an if's false-set when the lone
        then-branch can't complete normally (and the true-set mirror)."""
        if len(self.pattern_binds) <= mark:
            return
        cond = next((c for c in node.children
                     if c.role == M.ROLE_CONDITION), None)
        tset, fset = self._expr_pattern_sets(cond)
        keep: set[int] = set()
        cst = node.control_structure_type
        if cst == M.CS_IF:
            then = next((c for c in node.children
                         if c.role == M.ROLE_WHEN_TRUE), None)
            els = next((c for c in node.children
                        if c.role == M.ROLE_WHEN_FALSE), None)
            # JLS 6.3.2.2: after `if (e) S [else T]`, a variable introduced
            # when FALSE survives iff S can't complete normally (with or
            # without an else — PatternExprTests "introduced to the else
            # block and surrounding scope"), and one introduced when TRUE
            # survives iff T exists and can't complete normally
            if fset and self._cant_complete_normally(then):
                keep |= {id(l) for l in fset.values()}
            if tset and els is not None \
                    and self._cant_complete_normally(els):
                keep |= {id(l) for l in tset.values()}
        elif cst in (M.CS_WHILE, M.CS_DO, M.CS_FOR):
            keep |= {id(l) for l in fset.values()}
        self._pattern_restore(mark, keep)

    def body_scope_enter(self, cond: N | None, when_true: bool):
        """JLS 6.3: inside a branch only the condition's pattern variables
        introduced on THAT branch are in scope — `while (!(o instanceof
        String s)) { sink1(s); }` must resolve `s` to the field, not the
        pattern local (PatternExprTests "a variable is introduced by the
        while")."""
        if not self.pattern_binds or not self._cs_marks:
            return None
        t, f = self._expr_pattern_sets(cond)
        active = t if when_true else f
        hidden = []
        for rec in self.pattern_binds[self._cs_marks[-1]:]:
            scope, name, prev, existed, loc = rec
            if active.get(name) is loc or scope.get(name) is not loc:
                continue
            hidden.append(rec)
            if existed:
                scope[name] = prev
            else:
                scope.pop(name, None)
        return hidden

    def body_scope_exit(self, hidden) -> None:
        for scope, name, _prev, _existed, loc in hidden or ():
            scope[name] = loc

    def parse_if(self) -> N:
        mark = self._pattern_mark()
        self._cs_marks.append(mark)
        try:
            node = super().parse_if()
        finally:
            self._cs_marks.pop()
        self._pattern_flow_restore(node, mark)
        return node

    def parse_while(self) -> N:
        mark = self._pattern_mark()
        self._cs_marks.append(mark)
        try:
            node = super().parse_while()
        finally:
            self._cs_marks.pop()
        self._pattern_flow_restore(node, mark)
        return node

    def parse_do(self) -> N:
        mark = self._pattern_mark()
        self._cs_marks.append(mark)
        try:
            node = super().parse_do()
        finally:
            self._cs_marks.pop()
        self._pattern_flow_restore(node, mark)
        return node

    def _instanceof_pattern(self, lhs: N, pattern: dict) -> N:
        root_src = self._init_ref_source(lhs)
        buffer: list[tuple[dict, dict]] = []
        if pattern["kind"] == "type":
            buffer.append((pattern, root_src))
        check = self._pattern_check(pattern, root_src, True, buffer)
        assigns: list[N] = []
        tset: dict[str, N] = {}
        for pat, src in buffer:
            assign, loc = self._pattern_assign(pat, src)
            assigns.append(assign)
            tset[pat["name"]] = loc
            self._declare_pattern_var(pat["name"], loc)
        line = pattern["line"]
        true_lit = N(M.LITERAL, code="true", type_full_name="boolean",
                     line=line)
        blk_children = assigns + [true_lit]
        blk = N(M.BLOCK,
                code="{ " + "; ".join(c.code for c in blk_children) + "; }",
                line=line, type_full_name="boolean")
        blk.add(*blk_children)
        check.arg_index, blk.arg_index = 1, 2
        and_call = N(M.CALL, code=f"({check.code}) && {blk.code}",
                     name=M.OP_LOGICAL_AND,
                     method_full_name=M.OP_LOGICAL_AND,
                     dispatch_type=M.STATIC_DISPATCH,
                     line=line, type_full_name="boolean")
        and_call.add(check, blk)
        if tset:
            self.expr_patterns[id(and_call)] = (tset, {})
        return and_call

    def parse_array_initializer(self, ty: str) -> N:
        """`{ 1, 2, 3 }` -> <operator>.arrayInitializer CALL whose code is the
        JavaParser-normalized rendering "{ 1, 2, 3 }" and whose arguments are
        the element expressions (astForArrayInitializerExpr,
        AstForSimpleExpressionsCreator.scala:88-110; ArrayTests.scala:56-78)."""
        lb = self.expect("{")
        elem_ty = ty[:-2] if ty.endswith("[]") else ty
        vals: list[N] = []
        while self.peek() is not None and not self.at("}"):
            if self.at("{"):
                vals.append(self.parse_array_initializer(elem_ty))
            else:
                vals.append(self.parse_assignment_expr())
            if self.at(","):
                self.next()
        self.expect("}")
        code = "{ " + ", ".join(v.code for v in vals) + " }" if vals else "{}"
        node = N(M.CALL, code=code, name=M.OP_ARRAY_INITIALIZER,
                 method_full_name=M.OP_ARRAY_INITIALIZER,
                 dispatch_type=M.STATIC_DISPATCH, line=lb.line,
                 type_full_name=ty)
        for i, v in enumerate(vals, start=1):
            v.arg_index = i
            node.add(v)
        return node

    def parse_new(self) -> N:
        op_tok = self.next()
        raw_ty = self.parse_java_type()
        new_sig_raw = self.last_raw_type  # before args can clobber it
        # parse_java_type consumes empty `[]` pairs — recover the element
        # type and dimension count for `new int[] {...}` shapes
        base_raw = raw_ty
        levels = 0
        while base_raw.endswith("[]"):
            base_raw = base_raw[:-2]
            levels += 1
        ty = self.resolve_type(raw_ty)
        if levels or self.at("["):  # array creation
            dims: list[N] = []
            while self.at("["):
                self.next()
                if not self.at("]"):
                    dims.append(self.parse_expression())
                self.expect("]")
                ty += "[]"
                levels += 1
            if self.at("{"):
                # `new int[] { 1, 2, 3 }` IS the arrayInitializer call; its
                # code is the whole normalized creation expression
                # (astForArrayCreationExpr rewrites initializerRoot.code,
                # AstForSimpleExpressionsCreator.scala:66-69;
                # ArrayTests.scala:27-30)
                init = self.parse_array_initializer(ty)
                init.code = f"new {base_raw}{'[]' * levels} {init.code}"
                init.type_full_name = ty
                return init
            # dimensioned creation without initializer -> <operator>.alloc
            # with the dimension expressions as arguments
            # (ArrayTests.scala:94-97 `new int[5][2]` args 5, 2)
            end = self.toks[self.pos - 1]
            call = N(M.CALL, code=self.slice(op_tok, end), name=M.OP_ALLOC,
                     method_full_name=M.OP_ALLOC, dispatch_type=M.STATIC_DISPATCH,
                     line=op_tok.line, type_full_name=ty)
            for i, d in enumerate(dims, start=1):
                d.arg_index = i
                call.add(d)
            return call
        args: list[N] = []
        if self.at("("):
            self.next()
            while not self.at(")"):
                a = self.parse_assignment_expr()
                args.append(a)
                if self.at(","):
                    self.next()
            self.next()
        end = self.toks[self.pos - 1]
        if self.at("{"):  # anonymous class body
            return self._parse_anon_class(ty, args, op_tok, end,
                                          super_raw=new_sig_raw)
        # javasrc2cpg-style: constructor invocation CALL named <init> with
        # methodFullName Type.<init>:void(...) (Defines.scala:25)
        known = self.class_methods.get(ty, {}).get(M.CONSTRUCTOR)
        if known:
            mfn = self._pick_overload(known, args)[0]
        elif ty in self.declared_types.values():
            # internal ctor-less class -> the synthesized default ctor
            mfn = f"{ty}.{M.CONSTRUCTOR}:void({','.join(M.ANY for _ in args)})"
        elif args:
            # external class: signature unresolvable without its sources
            # (GenericsTests.scala:18-20 `new Box<>(0)` ->
            # box.Box.<init>:<unresolvedSignature>(1))
            mfn = f"{ty}.{M.CONSTRUCTOR}:{M.UNRESOLVED_SIGNATURE}({len(args)})"
        else:
            # a no-arg external ctor IS fully known: void()
            # (TypeInferenceTests:202-255 `new Bar()` -> a.Bar.<init>:void())
            mfn = f"{ty}.{M.CONSTRUCTOR}:void()"
        call = N(M.CALL, code=self.slice(op_tok, end), name=M.CONSTRUCTOR,
                 method_full_name=mfn, dispatch_type=M.STATIC_DISPATCH,
                 line=op_tok.line, type_full_name=ty)
        for i, a in enumerate(args, start=1):
            a.arg_index = i
            call.add(a)
        # local classes: the synthesized capture params become implicit
        # arguments after the explicit ones — enclosing `this` first, then
        # the captured variables (LocalClassTests "object creation
        # expressions": argumentIndex continues after the explicit args)
        for off, (nm, cty) in enumerate(self.local_class_captures.get(ty, []),
                                        start=len(args) + 1):
            decl = self.lookup(nm)
            ident = N(M.IDENTIFIER, code=nm, name=nm, type_full_name=cty,
                      arg_index=off, line=op_tok.line)
            if decl is not None:
                ident.ref_target = decl
            call.add(ident)
        return call

    def _parse_anon_class(self, super_full: str, args: list["N"],
                          op_tok: "Tok", hdr_end: "Tok",
                          super_raw: str = "") -> "N":
        """`new Bar(...) { members }` — an anonymous TYPE_DECL named
        `Bar$N` with fullname `{context}.Bar$N` where the context is the
        enclosing method (`foo.Foo.foo`), field initializer (`foo.Foo.b`)
        or lambda fullname, and N counts anonymous classes per context
        (AnonymousClassTests.scala). The decl inherits ONLY the written
        supertype; a default `<init>:void()` takes an `outerClass`
        parameter (assigned first in the body) in instance contexts. The
        expression value is the `<init>` CALL typed as the anonymous
        class, with the TYPE_DECL attached as an AST-only child."""
        if self.anon_ctx:
            ctx, encl_cls, is_static = self.anon_ctx[-1][:3]
        else:
            encl_cls = self.qual("").rstrip(".$") or self.package
            ctx, is_static = encl_cls, True
        idx = self.anon_counts.get(ctx, 0)
        self.anon_counts[ctx] = idx + 1
        simple = super_full.split(".")[-1].split("$")[-1]
        name = f"{simple}${idx}"
        full = f"{ctx}.{name}"
        decl = N(M.TYPE_DECL, code=f"new {simple}(...) {{...}}", name=name,
                 full_name=full, inherits_from=[super_full],
                 line=op_tok.line, ast_parent_type=M.METHOD,
                 ast_parent_full_name=ctx,
                 # the written supertype is the whole signature — anonymous
                 # classes have no implicit-LObject row of their own
                 generic_signature=self.sig_of_raw(super_raw or simple))
        self.class_supers[full] = [super_full]
        self.class_methods.setdefault(full, {})
        self.expect("{")
        self.push_scope()
        self.class_ctx.append(full)
        self._prescan_members(full)
        while self.peek() is not None and not self.at("}"):
            member = self.parse_member(full, "class")
            if member is not None:
                decl.add(*member) if isinstance(member, list) else decl.add(member)
        if self.at("}"):
            self.next()
        self.class_ctx.pop()
        self.pop_scope()
        # default constructor: this + (instance context) outerClass param
        # with `this.outerClass = outerClass` first, then member inits
        inits = self.member_inits.pop(full, [])
        line = op_tok.line
        ctor = N(M.METHOD, code=f"{name}()", name=M.CONSTRUCTOR,
                 full_name=f"{full}.{M.CONSTRUCTOR}:void()",
                 signature="void()", line=line, ast_parent_type=M.TYPE_DECL,
                 ast_parent_full_name=full)
        this = N(M.METHOD_PARAMETER_IN, code="this", name="this",
                 type_full_name=full, param_index=0, line=line,
                 evaluation_strategy=M.BY_SHARING)
        ctor.add(this)
        body = N(M.BLOCK, line=line)
        if not is_static:
            outer = N(M.METHOD_PARAMETER_IN, code=f"{encl_cls} outerClass",
                      name="outerClass", type_full_name=encl_cls,
                      param_index=1, line=line,
                      evaluation_strategy=M.BY_SHARING)
            ctor.add(outer)
            this_id = N(M.IDENTIFIER, code="this", name="this",
                        type_full_name=full, arg_index=1, line=line)
            this_id.ref_target = this
            fld = N(M.FIELD_IDENTIFIER, code="outerClass", name="outerClass",
                    canonical_name="outerClass", arg_index=2, line=line)
            fa = N(M.CALL, code="this.outerClass", name=M.OP_FIELD_ACCESS,
                   method_full_name=M.OP_FIELD_ACCESS,
                   dispatch_type=M.STATIC_DISPATCH, type_full_name=encl_cls,
                   arg_index=1, line=line)
            fa.add(this_id, fld)
            outer_id = N(M.IDENTIFIER, code="outerClass", name="outerClass",
                         type_full_name=encl_cls, arg_index=2, line=line)
            outer_id.ref_target = outer
            asg = N(M.CALL, code="this.outerClass = outerClass",
                    name=M.OP_ASSIGNMENT, method_full_name=M.OP_ASSIGNMENT,
                    dispatch_type=M.STATIC_DISPATCH, type_full_name=encl_cls,
                    line=line)
            asg.add(fa, outer_id)
            body.add(asg)
        for fname, fty, init, iline, plocs in inits:
            body.children.extend(plocs)
            body.add(self._member_init_assign(full, fname, fty, init,
                                              iline, this))
        ctor.add(body)
        ctor.line_end = line
        ctor.add(N(M.METHOD_RETURN, code="RET", type_full_name="void",
                   evaluation_strategy=M.BY_VALUE, line=line))
        decl.add(ctor)
        self.class_methods[full].setdefault(M.CONSTRUCTOR, []).append(
            (ctor.full_name, False, []))
        self._emit_external_bindings(decl, full)
        call = N(M.CALL, code=self.slice(op_tok, hdr_end), name=M.CONSTRUCTOR,
                 method_full_name=ctor.full_name,
                 dispatch_type=M.STATIC_DISPATCH, line=op_tok.line,
                 type_full_name=full)
        for i, a in enumerate(args, start=1):
            a.arg_index = i
            call.add(a)
        call.add(decl)
        return call

    def parse_lambda(self) -> N:
        start = self.peek()
        outer_this = self.lookup("this")
        self.lambda_counter += 1
        lam_name = f"{M.LAMBDA_PREFIX}{self.lambda_counter - 1}"
        owner = ".".join(([self.package] if self.package else []) + self.ns)
        full = f"{owner}.{lam_name}" if owner else lam_name
        method = N(M.METHOD, code="<lambda>", name=lam_name, full_name=full,
                   signature=f"{M.ANY}()", line=start.line,
                   ast_parent_type=M.TYPE_DECL,
                   ast_parent_full_name=owner or self.global_block)
        self.push_scope()
        self.method_ctx.append(full)
        params: list[str] = []
        param_sigs: list[str] = []
        if self.at("("):
            self.next()
            while not self.at(")"):
                psig = self.UNSPEC_SIG
                if self.looks_like_java_type() and self.peek(1) is not None and self.peek(1).t == "id":
                    self.parse_java_type()
                    # explicitly-annotated lambda params sign their declared
                    # type; untyped ones L__unspecified_type;
                    psig = self.sig_of_raw(self.last_raw_type)
                if self.peek() is not None and self.peek().t == "id":
                    params.append(self.next().v)
                    param_sigs.append(psig)
                if self.at(","):
                    self.next()
            self.next()
        else:
            params.append(self.next().v)
            param_sigs.append(self.UNSPEC_SIG)
        method.generic_signature = ("(" + "".join(param_sigs) + ")"
                                    + self.UNSPEC_SIG)
        for i, pname in enumerate(params, start=1):
            p = N(M.METHOD_PARAMETER_IN, code=pname, name=pname, param_index=i,
                  line=start.line, evaluation_strategy=M.BY_SHARING)
            method.add(p)
            self.declare(pname, p)
        self.expect("->")
        encl_cls = self.anon_ctx[-1][1] if self.anon_ctx else owner
        is_static = self.anon_ctx[-1][2] if self.anon_ctx else False
        self.anon_ctx.append((full, encl_cls, is_static, full))
        frame = self._push_pattern_frame("lambda")
        blk = None
        try:
            if self.at("{"):
                blk = self.parse_compound()
                method.add(blk)
            else:
                body = self.parse_assignment_expr()
                blk = N(M.BLOCK, code="", line=start.line, type_full_name="void")
                ret = N(M.RETURN, code=f"return {body.code}", line=body.line)
                body.arg_index = 1
                ret.add(body)
                blk.add(ret)
                method.add(blk)
        finally:
            self.anon_ctx.pop()
            self._pop_pattern_frame(frame, blk)
        method.add(N(M.METHOD_RETURN, code="RET", type_full_name=M.ANY,
                     evaluation_strategy=M.BY_VALUE, line=start.line))
        self.method_ctx.pop()
        self.pop_scope()
        if outer_this is not None:
            # a lambda using instance state gets its own 0th `this`
            # parameter typed by the enclosing class (LambdaTests
            # "capturing instance vars" / "calling instance methods"
            # :278-322); the body's `this` uses keep their REF to the
            # ENCLOSING this param — that crossing edge IS the closure
            # capture (LambdaTests:351 closure binding refers to the
            # captured this param)
            def _uses_this(n: N) -> bool:
                if getattr(n, "ref_target", None) is outer_this:
                    return True
                return any(_uses_this(ch) for ch in n.children)
            if _uses_this(method):
                this_p = N(M.METHOD_PARAMETER_IN, code="this", name="this",
                           type_full_name=outer_this.type_full_name,
                           param_index=0, line=start.line,
                           evaluation_strategy=M.BY_SHARING)
                method.children.insert(0, this_p)
        ref = N(M.METHOD_REF, code="<lambda>", method_full_name=full, line=start.line)
        # lambda METHOD hangs off the same parent; METHOD_REF is the expression
        ref.add(method)
        return ref

    def _target_type_lambda(self, ref: N, iface: str,
                            targs: list[str] | None) -> None:
        """Adopt the target functional interface's substituted method
        signature onto an untyped lambda: `Function<String, String>` ->
        `Foo.<lambda>0:java.lang.String(java.lang.String)` with typed
        parameters and return (AstForLambdasCreator; LambdaTests:53-207)."""
        if ref.kind != M.METHOD_REF or not ref.children:
            return
        method = ref.children[0]
        if method.kind != M.METHOD or ":" in (method.full_name or "") \
                or M.LAMBDA_PREFIX not in method.name:
            return
        iface = (iface or "").rstrip("[]")
        info = FUNCTIONAL_IFACES.get(iface)
        if info is not None:
            tparams, _mname, ret_var, param_vars = info
            sub = {v: "java.lang.Object" for v in tparams}
            if targs and len(targs) == len(tparams):
                sub = {v: self.resolve_type(a)
                       for v, a in zip(tparams, targs)}
            sub_ret = sub.get(ret_var, ret_var)
            sub_params = [sub.get(v, v) for v in param_vars]
        else:
            # user-defined functional interface: its single declared method
            ms = self.class_methods.get(iface, {})
            cands = [e for nm, es in ms.items() if nm != M.CONSTRUCTOR
                     for e in es]
            if len(cands) != 1:
                return
            fn, _st, ptys = cands[0]
            sub_ret = fn.rsplit(":", 1)[1].split("(", 1)[0]
            sub_params = list(ptys)
        sig = f"{sub_ret}({','.join(sub_params)})"
        method.full_name = f"{method.full_name}:{sig}"
        method.signature = sig
        ps = [c for c in method.children
              if c.kind == M.METHOD_PARAMETER_IN and c.name != "this"]
        for p, ty in zip(ps, sub_params):
            if not p.type_full_name or p.type_full_name == M.ANY:
                p.type_full_name = ty
        mr = next((c for c in method.children
                   if c.kind == M.METHOD_RETURN), None)
        if mr is not None and (not mr.type_full_name
                               or mr.type_full_name == M.ANY):
            mr.type_full_name = sub_ret
        if sub_ret == "void":
            # a void-interface expression body is a plain statement, not a
            # wrapped return (LambdaTests "single-statement lambdas with no
            # return values" :586-609)
            blk = next((c for c in method.children
                        if c.kind == M.BLOCK), None)
            if blk is not None and len(blk.children) == 1 \
                    and blk.children[0].kind == M.RETURN \
                    and blk.children[0].children:
                expr = blk.children[0].children[0]
                expr.arg_index = -1
                blk.children[0] = expr
        ref.method_full_name = method.full_name
        ref.type_full_name = method.full_name

    def _target_type_lambda_args(self, resolved: str | None,
                                 args: list[N]) -> None:
        """Target-type lambda arguments from the resolved callee's declared
        parameter types (+ generic args captured by the prescan)."""
        if not resolved or ":" not in resolved:
            return
        if not any(a.kind == M.METHOD_REF for a in args):
            return
        sig = resolved.rsplit(":", 1)[1]
        ptys = sig[sig.index("(") + 1:-1].split(",") if "(" in sig else []
        targs_list = self.method_param_targs.get(resolved)
        for i, a in enumerate(args):
            if a.kind == M.METHOD_REF and i < len(ptys) and ptys[i]:
                self._target_type_lambda(
                    a, ptys[i],
                    targs_list[i] if targs_list
                    and i < len(targs_list) else None)

    def _enclosing_class_chain(self) -> list[str]:
        """Innermost-first fullnames of the enclosing type declarations.
        Backed by the explicit class-context stack so local and anonymous
        classes resolve against their OWN (method-scoped / `$N`) fullnames
        — `sink(barMember)` inside `new Bar() {...}` finds Bar's inherited
        member (AnonymousClassTests "extending non-trivial classes")."""
        if self.class_ctx:
            return list(reversed(self.class_ctx))
        # fallback ($-joined binary names from the namespace path)
        chain = []
        names = [p for p in self.ns if p]
        for i in range(len(names), 0, -1):
            nested = "$".join(names[:i])
            chain.append(f"{self.package}.{nested}" if self.package else nested)
        return chain

    _BOX = {"int": "java.lang.Integer", "long": "java.lang.Long",
            "double": "java.lang.Double", "float": "java.lang.Float",
            "boolean": "java.lang.Boolean", "byte": "java.lang.Byte",
            "short": "java.lang.Short", "char": "java.lang.Character"}

    def _pick_overload(self, entries: list[tuple[str, bool, list[str]]],
                       args: list[N]) -> tuple[str, bool, list[str]]:
        """JLS-lite overload selection (JavaParser's MethodResolutionLogic
        stand-in): prefer exact arity (varargs arrays absorb extras), then
        the candidate whose parameter types agree with the argument static
        types (boxing counts half); document order breaks ties."""
        if len(entries) == 1:
            return entries[0]

        def arity_ok(e):
            pt = e[2]
            if len(pt) == len(args):
                return True
            return bool(pt) and pt[-1].endswith("[]") \
                and len(args) >= len(pt) - 1

        cands = [e for e in entries if arity_ok(e)] or entries

        def score(e):
            pt, s = e[2], 0
            for i, a in enumerate(args):
                at = self.resolve_type(a.type_full_name or M.ANY)
                if i < len(pt):
                    p = pt[i]
                elif pt and pt[-1].endswith("[]"):
                    p = pt[-1][:-2]
                else:
                    continue
                if at == M.ANY:
                    continue
                if at == p:
                    s += 2
                elif self._BOX.get(at) == p or self._BOX.get(p) == at:
                    s += 1
            return s
        return max(cands, key=score)

    def _pack_varargs(self, name: str, sig: str, args: list[N],
                      line: int) -> list[N]:
        """Wrap a varargs call's trailing arguments in
        <operator>.arrayInitializer typed as the erased array parameter
        (TypeTests.scala "use an arrayInitializer call node to represent
        varargs in the call AST"); a directly-passed array stays as-is."""
        if f"{name}:{sig}" not in self.varargs_methods or "(" not in sig:
            return args
        inner = sig[sig.index("(") + 1:-1]
        ptypes = inner.split(",") if inner else []
        if not ptypes or not ptypes[-1].endswith("[]"):
            return args
        nfixed = len(ptypes) - 1
        if len(args) == len(ptypes) and \
                (args[-1].type_full_name or "").endswith("[]"):
            return args
        tail = args[nfixed:]
        arr = N(M.CALL, code=", ".join(a.code for a in tail),
                name=M.OP_ARRAY_INITIALIZER,
                method_full_name=M.OP_ARRAY_INITIALIZER,
                dispatch_type=M.STATIC_DISPATCH, line=line,
                type_full_name=ptypes[-1])
        for i, a in enumerate(tail, start=1):
            a.arg_index = i
            arr.add(a)
        return args[:nfixed] + [arr]

    def _lookup_unqualified(self, name: str,
                            args: list[N] | None = None
                            ) -> tuple[str, bool] | None:
        """Unqualified call resolution: (1) the enclosing class's own and
        INHERITED members — the fullname prefix stays the enclosing class
        (CallTests "call to method in same class": MoreDerived.method even
        though Base declares it); (2) lexically enclosing classes — the
        declaring class's registered fullname (MethodTests2: Foo.method
        from inside Foo.Sub)."""
        chain = self._enclosing_class_chain()
        if not chain:
            return None
        cur = chain[0]
        seen: set[str] = set()
        stack = [cur]
        while stack:
            c = stack.pop(0)
            if c in seen:
                continue
            seen.add(c)
            entries = self.class_methods.get(c, {}).get(name)
            if entries:
                fullname, is_static, _pt = self._pick_overload(
                    entries, args or [])
                sig = fullname.rsplit(":", 1)[1] if ":" in fullname else ""
                return f"{cur}.{name}:{sig}", is_static
            stack.extend(self.class_supers.get(c, []))
        for c in chain[1:]:
            entries = self.class_methods.get(c, {}).get(name)
            if entries:
                fullname, is_static, _pt = self._pick_overload(
                    entries, args or [])
                return fullname, is_static
        return None

    def build_call(self, callee: N, start: Tok) -> N:
        self.next()  # (
        args: list[N] = []
        while not self.at(")"):
            a = self.parse_assignment_expr()
            args.append(a)
            if self.at(","):
                self.next()
        close = self.expect(")")
        name = callee.name if callee.kind == M.IDENTIFIER else callee.code
        if callee.kind == M.IDENTIFIER and name in ("super", "this"):
            # explicit constructor invocation: a lone `<init>` call (no
            # alloc), STATIC_DISPATCH, receiver `this` typed as the TARGET
            # class (ConstructorInvocationTests "direct invocation using
            # `super`": obj.typeFullName "Foo"; "using `this`": "Bar")
            chain = self._enclosing_class_chain()
            encl = chain[0] if chain else ""
            if name == "this":
                target = encl
            else:
                sups = self.class_supers.get(encl, [])
                target = sups[0] if sups else "java.lang.Object"
            known = self.class_methods.get(target, {}).get(M.CONSTRUCTOR)
            if known:
                mfn = self._pick_overload(known, args)[0]
            elif target in self.declared_types.values():
                mfn = (f"{target}.{M.CONSTRUCTOR}:"
                       f"void({','.join(M.ANY for _ in args)})")
            elif args:
                mfn = (f"{target}.{M.CONSTRUCTOR}:"
                       f"{M.UNRESOLVED_SIGNATURE}({len(args)})")
            else:
                mfn = f"{target}.{M.CONSTRUCTOR}:void()"
            sig = mfn.rsplit(":", 1)[1] if ":" in mfn else ""
            call = N(M.CALL, code=self.slice(start, close),
                     name=M.CONSTRUCTOR, method_full_name=mfn,
                     dispatch_type=M.STATIC_DISPATCH, signature=sig,
                     type_full_name="void", line=start.line)
            this_decl = self.lookup("this")
            thisid = N(M.IDENTIFIER, code="this", name="this",
                       type_full_name=target, arg_index=0, line=start.line)
            if this_decl is not None:
                thisid.ref_target = this_decl
            call.add(thisid)
            for i, a in enumerate(args, start=1):
                a.arg_index = i
                call.add(a)
            return call
        # intra-class resolution against the pre-scanned member table
        resolved = None
        is_static = False
        info = self._lookup_unqualified(name, args)
        if info is not None:
            resolved, is_static = info
        if resolved is not None:
            mfn = resolved
            dispatch = M.STATIC_DISPATCH if is_static else M.DYNAMIC_DISPATCH
            if ":" in resolved:
                self._target_type_lambda_args(resolved, args)
                args = self._pack_varargs(
                    name, resolved.rsplit(":", 1)[1], args, start.line)
        else:
            # unresolved unqualified call: prefixed with the enclosing class
            # when there is one (CallTests "calls with unresolved receivers":
            # foo() -> Test.foo:<unresolvedSignature>(0))
            chain = self._enclosing_class_chain()
            prefix = chain[0] if chain else M.UNRESOLVED_NAMESPACE
            mfn = f"{prefix}.{name}:{M.UNRESOLVED_SIGNATURE}({len(args)})"
            # unresolvable calls default to dynamic dispatch
            # (AstForCallExpressionsCreator.dispatchTypeForCall:378-390)
            dispatch = M.DYNAMIC_DISPATCH
        # resolved instance calls spell the implicit receiver:
        # `this.add(argc, 3)` (codePrefixForMethodCall:431-443, CallTests
        # :753,833); unresolved calls keep the bare source spelling
        code = self.slice(start, close)
        if resolved is not None and not is_static:
            code = f"this.{code}"
        call = N(M.CALL, code=code, name=name,
                 method_full_name=mfn, dispatch_type=dispatch,
                 signature=resolved.rsplit(":", 1)[1] if resolved and ":" in resolved else "",
                 line=start.line)
        if resolved is not None and ":" in resolved:
            # type the call by the resolved return type so chained member
            # calls resolve (CallTests "call to method in derived class":
            # getCurrentSession().createQuery() -> Session.createQuery)
            ret = resolved.rsplit(":", 1)[1].split("(", 1)[0]
            if ret and ret != M.ANY:
                call.type_full_name = ret
        if dispatch == M.DYNAMIC_DISPATCH:
            # implicit `this` receiver for unqualified instance calls
            # (astForImplicitCallReceiver, AstForCallExpressionsCreator
            # .scala:84-88,130-140); REFs the enclosing method's `this`
            # parameter when one is in scope. The call CODE stays
            # unprefixed (codePrefixForMethodCall returns "" unresolved).
            this_decl = self.lookup("this")
            thisid = N(M.IDENTIFIER, code="this", name="this",
                       type_full_name=(this_decl.type_full_name
                                       if this_decl is not None else "ANY"),
                       line=start.line)
            if this_decl is not None:
                thisid.ref_target = this_decl
            thisid.role = M.ROLE_RECEIVER
            thisid.arg_index = 0
            call.add(thisid)
        for i, a in enumerate(args, start=1):
            a.arg_index = i
            call.add(a)
        return call

    def try_qualified_new(self, outer: N, start: Tok) -> N | None:
        """`outer.new Inner(...)` — inner-class constructor invocation
        (ConstructorInvocationTests "inner class constructor invocations"):
        a lone `<init>` CALL with methodFullName `Outer$Inner.<init>:sig`;
        the outer expression becomes the trailing argument (the receiver
        `this` slot is filled by the assignment target downstream, like
        every other inline init call in this frontend)."""
        if not self.at("new"):
            return None
        new_tok = self.next()
        name_tok = self.next()
        inner = name_tok.v
        self.skip_explicit_type_args()
        outer_ty = self.resolve_type(outer.type_full_name or "")
        target = ""
        if outer_ty and f"{outer_ty}${inner}" in self.declared_types.values():
            target = f"{outer_ty}${inner}"
        else:
            cands = [t for t in self.declared_types.values()
                     if t.endswith(f"${inner}")]
            if len(cands) == 1:
                target = cands[0]
        target = target or f"{outer_ty or M.UNRESOLVED_NAMESPACE}${inner}"
        args: list[N] = []
        if self.at("("):
            self.next()
            while not self.at(")"):
                args.append(self.parse_assignment_expr())
                if self.at(","):
                    self.next()
            self.next()
        end = self.toks[self.pos - 1]
        known = self.class_methods.get(target, {}).get(M.CONSTRUCTOR)
        if known:
            mfn = self._pick_overload(known, args)[0]
        elif target in self.declared_types.values():
            mfn = (f"{target}.{M.CONSTRUCTOR}:"
                   f"void({','.join(M.ANY for _ in args)})")
        else:
            mfn = (f"{target}.{M.CONSTRUCTOR}:"
                   f"{M.UNRESOLVED_SIGNATURE}({len(args)})")
        call = N(M.CALL, code=self.slice(start, end), name=M.CONSTRUCTOR,
                 method_full_name=mfn, dispatch_type=M.STATIC_DISPATCH,
                 signature=mfn.rsplit(":", 1)[1] if ":" in mfn else "",
                 line=new_tok.line, type_full_name=target)
        for i, a in enumerate(args, start=1):
            a.arg_index = i
            call.add(a)
        outer.arg_index = len(args) + 1
        call.add(outer)
        return call

    def build_member_call(self, receiver: N, fld_tok: Tok, start: Tok, arrow: bool) -> N:
        self.next()  # (
        args: list[N] = []
        while not self.at(")"):
            a = self.parse_assignment_expr()
            args.append(a)
            if self.at(","):
                self.next()
        close = self.expect(")")
        recv_ty = self.resolve_type(receiver.type_full_name)
        # prefer the receiver's recorded dynamic (constructed) type
        d = getattr(receiver, "ref_target", None)
        if d is not None and id(d) in self.dyn_ty:
            recv_ty = self.dyn_ty[id(d)]
        name = fld_tok.v
        # walk the receiver type's inheritance chain; the fullname prefix
        # stays the receiver's STATIC type (CallTests "call to method in
        # different class": derived.method -> Derived.method:void(int))
        info = None
        seen: set[str] = set()
        stack = [recv_ty]
        while stack:
            c = stack.pop(0)
            if not c or c in seen:
                continue
            seen.add(c)
            entries = (self.class_methods.get(c, {}).get(name)
                       or JDK_METHODS.get((c, name)))
            if entries:
                info = self._pick_overload(entries, args)
                break
            stack.extend(self.class_supers.get(c, []))
        if info is not None:
            found_fn, is_static, _pt = info
            dispatch = M.STATIC_DISPATCH if is_static else M.DYNAMIC_DISPATCH
            sig = found_fn.rsplit(":", 1)[1] if ":" in found_fn else ""
            # instance calls keep the receiver's STATIC type as the prefix
            # (CallTests "call to method in different class": Derived
            # .getCurrentSession); STATIC calls resolved on an ancestor use
            # the DEFINING class (CallTests "a static call to an inherited
            # method": Bar.foo() -> foo.Foo.foo)
            mfn = found_fn if is_static else f"{recv_ty}.{name}:{sig}"
            self._target_type_lambda_args(found_fn, args)
            args = self._pack_varargs(name, sig, args, start.line)
        elif recv_ty and recv_ty != M.ANY:
            mfn = f"{recv_ty}.{name}:{M.UNRESOLVED_SIGNATURE}({len(args)})"
            dispatch = M.DYNAMIC_DISPATCH
            sig = ""
        else:
            mfn = (f"{M.UNRESOLVED_NAMESPACE}.{name}:"
                   f"{M.UNRESOLVED_SIGNATURE}({len(args)})")
            dispatch = M.DYNAMIC_DISPATCH
            sig = ""
        call = N(M.CALL, code=self.slice(start, close), name=name,
                 method_full_name=mfn, dispatch_type=dispatch, signature=sig,
                 line=start.line)
        if sig and "(" in sig:
            # the call's type is the resolved return type — chained member
            # calls then resolve on it (GenericsTests.scala:63
            # `stringBox.<Integer>into().get()`)
            ret = sig.split("(", 1)[0]
            if ret:
                call.type_full_name = ret
        gen = JDK_GENERIC.get((recv_ty, name))
        if gen is not None:
            # expression type substitutes the receiver's DECLARED type
            # arguments (CallTests "call to method with generic return
            # type": Function<String, Integer> -> apply typed Integer)
            tparams, ret_var = gen
            d_raw = getattr(receiver, "ref_target", None)
            targs = self.decl_targs.get(id(d_raw)) if d_raw is not None \
                else None
            if targs and ret_var in tparams:
                if len(targs) == len(tparams):
                    sub = self.resolve_type(targs[tparams.index(ret_var)])
                    if sub and sub != M.ANY:
                        call.type_full_name = sub
        receiver.role = M.ROLE_RECEIVER
        receiver.arg_index = 0
        call.add(receiver)
        for i, a in enumerate(args, start=1):
            a.arg_index = i
            call.add(a)
        return call


def parse_java_file(repo: str, path: str, commit: str, content: str) -> list[N]:
    return JavaParser(content, path).parse()
