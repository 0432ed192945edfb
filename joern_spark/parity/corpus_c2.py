"""c2cpg AstCreationPassTests parity corpus, round-5 breadth — transcribed
BY HAND from c2cpg/src/test/scala/io/joern/c2cpg/passes/ast/
AstCreationPassTests.scala (one parity case per reference `in { }` block,
citing its line range).

Covers the declaration/expression/structural regions the round-4 corpus
left untranscribed: parenthesized and reference declarators, decltype,
qualified `::` chains, structured-binding ranged-for lowering, multi-init
for-loops, and the array-type consistency rules (`char[BUFSIZE]` typed
with the expanded size, raw code kept).
"""

CAP = "c2cpg/src/test/scala/io/joern/c2cpg/passes/ast/AstCreationPassTests.scala"


def _c(name, lang, code, cite_lines, **rels):
    return dict(name=name, lang=lang, wrap=False, code=code,
                cite=f"{CAP}:{cite_lines}", **rels)


CASES = [
    # :490-508 — parenthesized initializer lowers to `val = (new int[3])`
    # with the parens kept on the rhs code.
    _c("cpp-parens-decl", "cpp", """
void method() {
  int *val (new int[3]);
}
""", "490-508",
       ast={("val (new int[3])", 0): ["val", "(new int[3])"],
            ("(new int[3])", 0): ["new int[3]"],
            ("new int[3]", 0): ["int", "3"]},
       locals=[["method.val", "int *val|int*"]],
       callmfn=[["<operator>.assignment", "<operator>.assignment"],
                ["<operator>.new", "<operator>.new"],
                ["<operator>.alloc", "<operator>.alloc"]]),
    # :509-538 — `decltype(local)::value` is fieldAccess(typeOf(local),
    # value); the constexpr bool local types the assignment.
    _c("cpp-decltype-decl", "cpp", """
void method() {
  int local = 1;
  constexpr bool is_std_array_v = decltype(local)::value;
}
""", "509-538",
       ast={("is_std_array_v = decltype(local)::value", 0):
                ["is_std_array_v", "decltype(local)::value"],
            ("decltype(local)::value", 0): ["decltype(local)", "value"],
            ("decltype(local)", 0): ["local"]},
       locals=[["method.local", "int local|int"],
               ["method.is_std_array_v",
                "constexpr bool is_std_array_v|bool"]],
       callmfn=[["<operator>.typeOf", "<operator>.typeOf"],
                ["<operator>.fieldAccess", "<operator>.fieldAccess"],
                ["<operator>.assignment", "<operator>.assignment"]],
       nodetype={("is_std_array_v", 0, "IDENTIFIER"): "bool"}),
    # :539-574 — A::B::C::value nests fieldAccess left-to-right with the
    # `::`-spelled codes at every level.
    _c("cpp-qualified-multi", "cpp", """
namespace A {
  namespace B {
    struct C {
      static int value;
    };
  }
}
void foo() {
  int x = A::B::C::value;
}
""", "539-574",
       ast={("x = A::B::C::value", 0): ["x", "A::B::C::value"],
            ("A::B::C::value", 0): ["A::B::C", "value"],
            ("A::B::C", 0): ["A::B", "C"],
            ("A::B", 0): ["A", "B"]},
       callmfn=[["<operator>.fieldAccess", "<operator>.fieldAccess"],
                ["<operator>.assignment", "<operator>.assignment"]]),
    # :576-598 — two-part Foo::bar static read.
    _c("cpp-qualified-two", "cpp", """
struct Foo {
  static int bar;
};
void test() {
  int x = Foo::bar;
}
""", "576-598",
       ast={("x = Foo::bar", 0): ["x", "Foo::bar"],
            ("Foo::bar", 0): ["Foo", "bar"]},
       callmfn=[["<operator>.fieldAccess", "<operator>.fieldAccess"],
                ["<operator>.assignment", "<operator>.assignment"]]),
    # :599-612 — identifier rhs keeps the parameter's int type.
    _c("c-decl-ident-right", "c", """
void method(int x) {
  int local = x;
}
""", "599-612",
       ast={("local = x", 0): ["local", "x"]},
       locals=[["method.local", "int local|int"]],
       nodetype={("x", 0, "IDENTIFIER"): "int",
                 ("local", 0, "IDENTIFIER"): "int"}),
    # :613-626 — reference declarators keep the raw `struct x &bar` code.
    _c("cpp-decl-references", "cpp", """
int addrOfLocalRef(struct x **foo) {
  struct x &bar = **foo;
  *foo = &bar;
}
""", "613-626",
       locals=[["addrOfLocalRef.bar", "struct x &bar|x&"]]),
    # :627-652 — comma-declared locals each get their own assignment.
    _c("c-decl-multiple", "c", """
void method(int x, int y) {
  int local = x, local2 = y;
}
""", "627-652",
       locals=[["method.local", "int local|int"],
               ["method.local2", "int local2|int"]],
       ast={("local = x", 0): ["local", "x"],
            ("local2 = y", 0): ["local2", "y"]}),
    # :799-832 — structured-binding ranged-for over an array: FOR with
    # `<tmp>0 = foo` plus per-binding index accesses; locals keep the
    # sized array type, bindings stay ANY.
    _c("cpp-ranged-for-array", "cpp", """
void method() {
  int foo[2] = {1, 2};
  for(const auto& [a, b] : foo) {};
}
""", "799-832",
       locals=[["method.foo", "int foo[2]|int[2]"],
               ["method.<tmp>0", "<tmp>0|int[2]"],
               ["method.a", "a|ANY"], ["method.b", "b|ANY"]],
       cs=[["method:FOR", "for (const auto& [a, b]:foo)"]],
       ast={("<tmp>0 = foo", 0): ["<tmp>0", "foo"],
            ("a = <tmp>0[0]", 0): ["a", "<tmp>0[0]"],
            ("b = <tmp>0[1]", 0): ["b", "<tmp>0[1]"],
            ("<tmp>0[0]", 0): ["<tmp>0", "0"],
            ("<tmp>0[1]", 0): ["<tmp>0", "1"]}),
    # :833-856 — non-array collection: per-binding member accesses.
    _c("cpp-ranged-for-ref", "cpp", """
void method() {
  auto foo = bar();
  for(const auto& [a, b] : foo) {};
}
""", "833-856",
       cs=[["method:FOR", "for (const auto& [a, b]:foo)"]],
       ast={("<tmp>0 = foo", 0): ["<tmp>0", "foo"],
            ("a = <tmp>0.a", 0): ["a", "<tmp>0.a"],
            ("b = <tmp>0.b", 0): ["b", "<tmp>0.b"],
            ("<tmp>0.a", 0): ["<tmp>0", "a"],
            ("<tmp>0.b", 0): ["<tmp>0", "b"]},
       callmfn=[["<operator>.fieldAccess", "<operator>.fieldAccess"]]),
    # :857-884 — for with comma-separated initializations: init block
    # holds both assignments, condition/update/body in order.
    _c("c-for-multi-init", "c", """
void method(int x, int y) {
  for ( x = 0, y = 0; x < 1; x += 1) {
    int z = 0;
  }
}
""", "857-884",
       cs=[["method:FOR", "for"]],
       cscond=[["method:FOR", "x < 1"]],
       ast={("x = 0", 0): ["x", "0"], ("y = 0", 0): ["y", "0"],
            ("x += 1", 0): ["x", "1"], ("z = 0", 0): ["z", "0"],
            ("<empty>", 1): ["x = 0", "y = 0"],
            ("<empty>", 2): ["int z", "z = 0"]}),
    # -- passes/ast/ControlStructureTests.scala remainder ------------- #
    # CS:252-268 — if/else-if/else chain: TRUE/FALSE_BODY edges.
    dict(name="c-cs-ifelse-chain", lang="c", wrap=False, code="""
void foo(int c) {
  if (c > 10) {
    c -= 10;
  } else if (c < 10) {
    c += 10;
  } else {
    c = 10;
  }
}
""",
         roledge={("if (c > 10)", 0): ["CONDITION:c > 10",
                                       "TRUE_BODY:<empty>",
                                       "FALSE_BODY:else"],
                  ("if (c < 10)", 0): ["CONDITION:c < 10",
                                       "TRUE_BODY:<empty>",
                                       "FALSE_BODY:else"]},
         ast={("else", 0): ["if (c < 10)"],
              ("<empty>", 1): ["c -= 10"], ("<empty>", 2): ["c += 10"],
              ("<empty>", 3): ["c = 10"]},
         cite="c2cpg/.../passes/ast/ControlStructureTests.scala:252-268"),
    # CS:270-282 — no FALSE_BODY without else.
    dict(name="c-cs-if-no-else", lang="c", wrap=False, code="""
void foo(int x) {
  if (x > 0) { sink(x); }
}
""",
         roledge={("if (x > 0)", 0): ["CONDITION:x > 0",
                                      "TRUE_BODY:<empty>"]},
         ast={("<empty>", 1): ["sink(x)"]},
         cite="c2cpg/.../passes/ast/ControlStructureTests.scala:270-282"),
    # CS:284-297 — DO_BODY edge.
    dict(name="c-cs-dowhile-edge", lang="c", wrap=False, code="""
void foo(int c) {
  do {
    c += 1;
  } while (c < 10);
}
""",
         roledge={("do", 0): ["CONDITION:c < 10", "DO_BODY:<empty>"]},
         cscond=[["foo:DO", "c < 10"]],
         ast={("<empty>", 1): ["c += 1"]},
         cite="c2cpg/.../passes/ast/ControlStructureTests.scala:284-297"),
    # CS:299-314 — FOR_INIT/FOR_UPDATE/FOR_BODY edges.
    dict(name="c-cs-for-edges", lang="c", wrap=False, code="""
void foo(int c) {
  for (int i = 0; i < c; i++) {
    sink(i);
  }
}
""",
         roledge={("for", 0): ["CONDITION:i < c", "FOR_INIT:i = 0",
                               "FOR_UPDATE:i++", "FOR_BODY:<empty>"]},
         ast={("<empty>", 1): ["sink(i)"]},
         cite="c2cpg/.../passes/ast/ControlStructureTests.scala:299-314"),
    # CS:316-335 — TRY_BODY/CATCH_BODY edges, no finally.
    dict(name="c-cs-trycatch-edges", lang="c", wrap=False, code="""
void foo() {
  try {
    sink();
  } catch (int e) {
    sinkCatch(e);
  }
}
""",
         roledge={("try", 0): ["TRY_BODY:<empty>", "CATCH_BODY:catch"]},
         ast={("<empty>", 1): ["sink()"], ("<empty>", 2): ["sinkCatch(e)"],
              ("catch", 0): ["<empty>", "int e"]},
         cite="c2cpg/.../passes/ast/ControlStructureTests.scala:316-335"),
    # CS:338-358 — shadowed loop variable keeps both typed locals, uses
    # resolve to the nearest declaration.
    dict(name="c-cs-shadowed-for", lang="c", wrap=False, code="""
void foo(void) {
  int x = 52;
  for (float x = 1.0; x > 0.5; x--) {}
}
""",
         locals=[["foo.x", "int x|int"], ["foo.x", "float x|float"]],
         nodetype={("x", 0, "IDENTIFIER"): "int",
                   ("x", 1, "IDENTIFIER"): "float",
                   ("x", 2, "IDENTIFIER"): "float",
                   ("x", 3, "IDENTIFIER"): "float"},
         cite="c2cpg/.../passes/ast/ControlStructureTests.scala:338-358"),
    # CS:360-392 — shadowing across the ranged-for lowering.
    dict(name="cpp-cs-shadowed-ranged", lang="cpp", wrap=False, code="""
void foo() {
  int x = 1;
  float xs[] = {1.0, 2.0, 3.0};
  for (float x : xs) {}
}
""",
         locals=[["foo.x", "int x|int"], ["foo.x", "x|float"],
                 ["foo.xs", "float xs[]|float[]"],
                 ["foo.<iterator>0", "<iterator>0|std.iterator"]],
         nodetype={("x", 0, "IDENTIFIER"): "int",
                   ("x", 1, "IDENTIFIER"): "float"},
         cite="c2cpg/.../passes/ast/ControlStructureTests.scala:360-392"),
    # CS:400-407 — `if (cond);` keeps an EMPTY true-body block.
    dict(name="c-cs-semicolon-if", lang="c", wrap=False, code="""
void checkSemicolon(int a, int b) {
  if (a == b); {
    something();
  }
}
""",
         roledge={("if (a == b)", 0): ["CONDITION:a == b",
                                       "TRUE_BODY:<empty>"]},
         ast={("if (a == b)", 0): ["a == b", "<empty>"],
              ("<empty>", 1): []},
         cite="c2cpg/.../passes/ast/ControlStructureTests.scala:400-407"),
    # CS:409-416
    dict(name="c-cs-semicolon-for", lang="c", wrap=False, code="""
void checkSemicolon2(int a, int b) {
  for (int i = 0; i < 10; i++); {
    something();
  }
}
""",
         roledge={("for", 0): ["CONDITION:i < 10", "FOR_INIT:i = 0",
                               "FOR_UPDATE:i++", "FOR_BODY:<empty>"]},
         ast={("<empty>", 1): []},
         cite="c2cpg/.../passes/ast/ControlStructureTests.scala:409-416"),
    # CS:418-425
    dict(name="c-cs-semicolon-while", lang="c", wrap=False, code="""
void checkSemicolon3(int a, int b) {
  while (a < b); {
    something();
  }
}
""",
         roledge={("while (a < b)", 0): ["CONDITION:a < b",
                                         "TRUE_BODY:<empty>"]},
         ast={("<empty>", 1): []},
         cite="c2cpg/.../passes/ast/ControlStructureTests.scala:418-425"),
    # CS:429-462 — while condition declaration: the LOCAL hoists to the
    # method block, the condition is the bare assignment.
    dict(name="cpp-while-decl-cond", lang="cpp", wrap=False, code="""
void main() {
  while (const char* c = read()) {
    foo(c);
  }
}
""",
         cscond=[["main:WHILE", "c = read()"]],
         locals=[["main.c", "char* c|char*"]],
         ast={("<empty>", 0): ["char* c",
                               "while (const char* c = read())"],
              ("c = read()", 0): ["c", "read()"]},
         cite="c2cpg/.../passes/ast/ControlStructureTests.scala:429-462"),
    # CS:464-490
    dict(name="cpp-while-int-decl-cond", lang="cpp", wrap=False, code="""
void main() {
  while (int n = count()) {
    process(n);
  }
}
""",
         cscond=[["main:WHILE", "n = count()"]],
         locals=[["main.n", "int n|int"]],
         cite="c2cpg/.../passes/ast/ControlStructureTests.scala:464-490"),
    # CS:492-515 — for condition declaration: the LOCAL lives under the
    # FOR node.
    dict(name="cpp-for-decl-cond", lang="cpp", wrap=False, code="""
void main() {
  for (int i = 0; char* p = getNext(); i++) {
    process(p);
  }
}
""",
         cscond=[["main:FOR", "p = getNext()"]],
         locals=[["main.p", "char* p|char*"],
                 ["main.i", "int i|int"]],
         ast={("for", 0): ["int i", "i = 0", "char* p", "p = getNext()",
                           "i++", "<empty>"]},
         cite="c2cpg/.../passes/ast/ControlStructureTests.scala:492-515"),

    # -- passes/ast/LambdaExpressionTests.scala breadth ---------------- #
    # LE:44-54 — lambda METHOD with typed param and return.
    dict(name="cpp-lambda-arg-method", lang="cpp", wrap=False, code="""
class Foo {
  public:
    string getFromSupplier(string input, std::function<string(string)>& mapper) {
      return mapper.apply(input);
    }

    void foo(string input, string fallback) {
      getFromSupplier(
        input,
        [fallback] (string lambdaInput) -> string { return lambdaInput.length() > 5 ? "Long" : fallback; }
      );
    }
}
""",
         methods=[["<lambda>0",
                   "cpp-lambda-arg-method.cpp:<global>.Foo.foo.<lambda>0:string(string)"]],
         params=[["<lambda>0.lambdaInput", "1:string:BY_VALUE"]],
         cite="c2cpg/.../passes/ast/LambdaExpressionTests.scala:44-54"),
    # LE:37-42 — lambdaInput refs the lambda's own parameter.
    dict(name="cpp-lambda-arg-paramref", lang="cpp", wrap=False, code="""
class Foo2 {
  public:
    void foo(string input, string fallback) {
      getFromSupplier(
        input,
        [fallback] (string lambdaInput) -> string { return lambdaInput.length() > 5 ? "Long" : fallback; }
      );
    }
}
""",
         refs={("lambdaInput", 0, "IDENTIFIER"):
                   ["string lambdaInput&<lambda>0@0"]},
         cite="c2cpg/.../passes/ast/LambdaExpressionTests.scala:37-42"),
    # LE:68-89 — captured identifiers become LOCALs at the lambda body
    # start, typed from the captured declaration.
    dict(name="cpp-lambda-arg-capture-local", lang="cpp", wrap=False, code="""
class Foo3 {
  public:
    void foo(string input, string fallback) {
      getFromSupplier(
        input,
        [fallback] (string lambdaInput) -> string { return lambdaInput.length() > 5 ? "Long" : fallback; }
      );
    }
}
""",
         locals=[["<lambda>0.fallback", "fallback|string"]],
         ast={("lambdaInput.length() > 5 ? \"Long\" : fallback", 0):
                  ["lambdaInput.length() > 5", "\"Long\"", "fallback"]},
         cite="c2cpg/.../passes/ast/LambdaExpressionTests.scala:68-106"),
    # LE:128-136 — return-type annotations: explicit, inferred, unknown,
    # mutable variants.
    dict(name="cpp-lambda-ret-annotations", lang="cpp", wrap=False, code="""
void foo() {
  auto l1 = [] () -> int { return 1; };
  auto l2 = [] () { return 1; };
  auto l3 = [] () -> unknown { return bar(); };
  auto l4 = [] () mutable -> int { return 1; };
  auto l5 = [] () mutable { return 1; };
}
""",
         methods=[["<lambda>0",
                   "cpp-lambda-ret-annotations.cpp:<global>.foo.<lambda>0:int()"],
                  ["<lambda>1",
                   "cpp-lambda-ret-annotations.cpp:<global>.foo.<lambda>1:int()"],
                  ["<lambda>2",
                   "cpp-lambda-ret-annotations.cpp:<global>.foo.<lambda>2:unknown()"],
                  ["<lambda>3",
                   "cpp-lambda-ret-annotations.cpp:<global>.foo.<lambda>3:int()"],
                  ["<lambda>4",
                   "cpp-lambda-ret-annotations.cpp:<global>.foo.<lambda>4:int()"],
                  ["foo", "foo:void()"]],
         cite="c2cpg/.../passes/ast/LambdaExpressionTests.scala:128-136"),
    # LE:149-176 — a this-capturing lambda returns bool for the pointer
    # comparison (C++ comparisons are bool).
    dict(name="cpp-lambda-capture-this", lang="cpp", wrap=False, code="""
class Foo {
  public:
    int firstDirty;
    void foo() {
      bar(l, [this] { return this->firstDirty == nullptr; });
    }
}
""",
         methods=[["<lambda>0",
                   "cpp-lambda-capture-this.cpp:<global>.Foo.foo.<lambda>0:bool()"],
                  ["foo", "Foo.foo:void()"]],
         cite="c2cpg/.../passes/ast/LambdaExpressionTests.scala:149-176"),
    # LE:455-493 — file-level lambdas assign METHOD_REFs with
    # global-scoped fullnames.
    dict(name="cpp-lambda-global", lang="cpp", wrap=False, code="""
auto x = [] (int a, int b) -> int
 { return a + b; };
auto y = [] (string a, string b) -> string
 { return a + b; };
""",
         methods=[["<lambda>0",
                   "cpp-lambda-global.cpp:<global>.<lambda>0:int(int,int)"],
                  ["<lambda>1",
                   "cpp-lambda-global.cpp:<global>.<lambda>1:string(string,string)"],
                  ["<global>", "cpp-lambda-global.cpp:<global>"]],
         msig=[["<lambda>0", "int(int,int)"],
               ["<lambda>1", "string(string,string)"]],
         nodemfn={("<lambda>", 0):
                      "cpp-lambda-global.cpp:<global>.<lambda>0:int(int,int)",
                  ("<lambda>", 1):
                      "cpp-lambda-global.cpp:<global>.<lambda>1:string(string,string)"},
         cite="c2cpg/.../passes/ast/LambdaExpressionTests.scala:455-493"),
    # LE:555-580 — calling lambdas: the holding local types std.function,
    # direct invocation goes through pointerCall.
    dict(name="cpp-lambda-calling", lang="cpp", wrap=False, code="""
void foo() {
auto x = [](int n) -> int
{
  return 32 + n;
};

constexpr int foo1 = x(10);
constexpr int foo2 = [](int n) -> int
{
  return 32 + n;
}(10);
}
""",
         methods=[["<lambda>0",
                   "cpp-lambda-calling.cpp:<global>.foo.<lambda>0:int(int)"],
                  ["<lambda>1",
                   "cpp-lambda-calling.cpp:<global>.foo.<lambda>1:int(int)"],
                  ["foo", "foo:void()"]],
         locals=[["foo.x", "auto x|std.function"],
                 ["foo.foo1", "constexpr int foo1|int"],
                 ["foo.foo2", "constexpr int foo2|int"]],
         ast={("x(10)", 0): ["x", "10"]},
         cite="c2cpg/.../passes/ast/LambdaExpressionTests.scala:555-580"),

    # -- passes/types/ClassTypeTests.scala breadth --------------------- #
    # CT:21-25 + :45-48 — member TYPE.
    dict(name="cpp-classtype-member", lang="cpp", wrap=False, code="""
class Foo {
  member_type x;
};

ret_type myFunc(param_type param) {
  local_type y;
}""",
         members=[["Foo.x", "member_type"]],
         membercode=[["Foo.x", "x"]],
         cite="c2cpg/.../passes/types/ClassTypeTests.scala:21-25,45-48"),
    # CT:27-31 + :50-53 — return TYPE.
    dict(name="cpp-classtype-ret", lang="cpp", wrap=False, code="""
class Foo2 {
  member_type x;
};

ret_type myFunc(param_type param) {
  local_type y;
}""",
         nodetype={("RET", 0, "METHOD_RETURN"): "ret_type"},
         cite="c2cpg/.../passes/types/ClassTypeTests.scala:27-31,50-53"),
    # CT:33-37 + :55-58 — parameter TYPE.
    dict(name="cpp-classtype-param", lang="cpp", wrap=False, code="""
class Foo3 {
  member_type x;
};

ret_type myFunc(param_type param) {
  local_type y;
}""",
         params=[["myFunc.param", "1:param_type:BY_VALUE"]],
         cite="c2cpg/.../passes/types/ClassTypeTests.scala:33-37,55-58"),
    # CT:39-43 + :60-63 — local TYPE.
    dict(name="cpp-classtype-local", lang="cpp", wrap=False, code="""
class Foo4 {
  member_type x;
};

ret_type myFunc(param_type param) {
  local_type y;
}""",
         locals=[["myFunc.y", "local_type y|local_type"]],
         cite="c2cpg/.../passes/types/ClassTypeTests.scala:39-43,60-63"),
    # CT:165-190 — ctor signature resolves qualified reference parameter
    # types; the implicit this is FooT* at index 0.
    dict(name="cpp-class-ctor-types", lang="cpp", wrap=False, code="""
class FooT : public Foo {
  public:
    FooT(
      const std::string& a,
      const Bar::SomeClass& b
    ): Bar::Foo(a, b) {}
}""",
         methods=[["FooT",
                   "FooT.FooT:void(std.string&,Bar.SomeClass&)"]],
         msig=[["FooT", "void(std.string&,Bar.SomeClass&)"]],
         params=[["FooT.this", "0:FooT*:BY_SHARING"],
                 ["FooT.a", "1:std.string&:BY_VALUE"],
                 ["FooT.b", "2:Bar.SomeClass&:BY_VALUE"]],
         cite="c2cpg/.../passes/types/ClassTypeTests.scala:165-190"),
    # CT:192-216 — operator overload fullnames use the bare symbols;
    # `operator delete` keeps the declared void return.
    dict(name="cpp-operator-defs", lang="cpp", wrap=False, code="""
class Foo {
  public:
    void operator delete (void *d) { free(d); }
    bool operator == (const Foo &lhs, const Foo &rhs) { return false; }
    Foo &Foo::operator + (const Foo &lhs, const Foo &rhs) { return null; }
    Foo &Foo::operator() (const Foo &a) { return null; }
    Foo &Foo::operator[] (int index) { return null; }
}
Foo &Foo::operator + (const Foo &lhs, const Foo &rhs)
""",
         methods=[["delete", "Foo.delete:void(void*)"],
                  ["==", "Foo.==:bool(Foo&,Foo&)"],
                  ["+", "Foo.+:Foo&(Foo&,Foo&)"],
                  ["()", "Foo.():Foo&(Foo&)"],
                  ["[]", "Foo.[]:Foo&(int)"]],
         cite="c2cpg/.../passes/types/ClassTypeTests.scala:192-216"),
    # CT:218-230 — conversion operators adopt the qualified target type.
    dict(name="cpp-operator-conversion", lang="cpp", wrap=False, code="""
class Foo {
  enum Kind { A, B, C } kind;
 public:
   operator Kind() const { return kind; }
};
""",
         methods=[["Kind", "Foo.Kind:Foo.Kind()<const>"]],
         cite="c2cpg/.../passes/types/ClassTypeTests.scala:218-230"),

    # -- passes/types/TypeNodePassTests.scala ------------------------- #
    # TN:13-22 — typedef aliases resolve transitively (foo* -> char**).
    dict(name="c-typedef-toplevel", lang="c", wrap=False, code="""
typedef const char * foo;
typedef foo * bar;
""",
         tdalias=[["foo", "char*"], ["bar", "char**"]],
         cite="c2cpg/.../passes/types/TypeNodePassTests.scala:13-22"),
    # TN:24-34 — reference-to-array typedef keeps the `char(&)[2]` form.
    dict(name="cpp-typedef-ref-array", lang="cpp", wrap=False, code="""
typedef const char (&TwoChars)[2];
""",
         tdalias=[["TwoChars", "char(&)[2]"]],
         cite="c2cpg/.../passes/types/TypeNodePassTests.scala:24-34"),
    # TN:49-70 — static storage class drops from the local type; no stray
    # nodes in the block.
    dict(name="c-static-decl", lang="c", wrap=False, code="""
void method() {
  static int local = 1;
}
""",
         locals=[["method.local", "static int local|int"]],
         ast={("<empty>", 0): ["static int local", "local = 1"],
              ("local = 1", 0): ["local", "1"]},
         nodetype={("local", 0, "IDENTIFIER"): "int",
                   ("1", 0, "LITERAL"): "int"},
         cite="c2cpg/.../passes/types/TypeNodePassTests.scala:49-70"),
    # TN:72-93
    dict(name="c-const-decl", lang="c", wrap=False, code="""
void method() {
  const int local = 1;
}
""",
         locals=[["method.local", "const int local|int"]],
         ast={("<empty>", 0): ["const int local", "local = 1"],
              ("local = 1", 0): ["local", "1"]},
         cite="c2cpg/.../passes/types/TypeNodePassTests.scala:72-93"),
    # TN:95-116
    dict(name="c-static-const-decl", lang="c", wrap=False, code="""
void method() {
  static const int local = 1;
}
""",
         locals=[["method.local", "static const int local|int"]],
         ast={("<empty>", 0): ["static const int local", "local = 1"],
              ("local = 1", 0): ["local", "1"]},
         cite="c2cpg/.../passes/types/TypeNodePassTests.scala:95-116"),
    # TN:126-140 — sized array local type.
    dict(name="c-local-array-1024", lang="c", wrap=False, code="""
int main() {
  char test[1024];
}""",
         locals=[["main.test", "char test[1024]|char[1024]"]],
         cite="c2cpg/.../passes/types/TypeNodePassTests.scala:126-140"),
    # TN:142-179 — struct pointer locals spell `test*`.
    dict(name="c-struct-ptr-types", lang="c", wrap=False, code="""
struct test {
  int a;
};

void free_struct() {
  struct test *ptr;
  ptr = kzalloc(sizeof(struct test), GFP_KERNEL);
  free(ptr);
}
""",
         locals=[["free_struct.ptr", "struct test *ptr|test*"]],
         nodetype={("ptr", 0, "IDENTIFIER"): "test*",
                   ("ptr", 1, "IDENTIFIER"): "test*"},
         cite="c2cpg/.../passes/types/TypeNodePassTests.scala:142-179"),
    # TN:181-191 — array argument eval type.
    dict(name="c-memcpy-array-type", lang="c", wrap=False, code="""
void bad1(size_t a) {
  uint8_t src[1], dst[1];
  memcpy(dst, src, a);
}
""",
         locals=[["bad1.src", "uint8_t src[1]|uint8_t[1]"],
                 ["bad1.dst", "uint8_t src[1], dst[1]|uint8_t[1]"]],
         nodetype={("dst", 0, "IDENTIFIER"): "uint8_t[1]",
                   ("src", 0, "IDENTIFIER"): "uint8_t[1]"},
         cite="c2cpg/.../passes/types/TypeNodePassTests.scala:181-191"),
    # TN:208-228 — identifier types through malloc'd pointers.
    dict(name="c-identifier-types", lang="c", wrap=False, code="""
void test_func() {
  char * badChar = malloc(0x100);
  free(badChar);
  return;
}""",
         locals=[["test_func.badChar", "char * badChar|char*"]],
         nodetype={("badChar", 0, "IDENTIFIER"): "char*",
                   ("badChar", 1, "IDENTIFIER"): "char*"},
         cite="c2cpg/.../passes/types/TypeNodePassTests.scala:208-228"),
    # TN:230-248 — volatile survives into the type; const/static drop.
    dict(name="c-volatile-types", lang="c", wrap=False, code="""
void func(void) {
  static volatile int **ipp;
  static int *ip;
  static volatile int i = 0;

  ipp = &ip;
  ipp = (int**) &ip;
  *ipp = &i;
  if (*ip != 0) {}
}""",
         locals=[["func.ipp",
                  "static volatile int **ipp|volatile int**"],
                 ["func.ip", "static int *ip|int*"],
                 ["func.i", "static volatile int i|volatile int"]],
         nodetype={("ipp", 0, "IDENTIFIER"): "volatile int**",
                   ("ipp", 1, "IDENTIFIER"): "volatile int**",
                   ("ip", 0, "IDENTIFIER"): "int*",
                   ("i", 0, "IDENTIFIER"): "volatile int",
                   ("i", 1, "IDENTIFIER"): "volatile int"},
         cite="c2cpg/.../passes/types/TypeNodePassTests.scala:230-248"),

    # -- passes/ast/Cpp17FeaturesTests.scala breadth ------------------- #
    # C17:14-36 — member initializer lists lower to `this->x = <expr>`
    # assignments; the param shadows the same-named member (`i(i)`).
    dict(name="cpp17-member-init-list", lang="cpp", wrap=False, code="""
class X
{
    int a, b, i, j;
public:
    const int& r;
    X(int i)
      : r(a)
      , b{i}
      , i(i)
      , j(this->i)
    {}
};
""",
         ast={("<empty>", 0): ["this->r = this->a", "this->b = i",
                               "this->i = i", "this->j = this->i"],
              ("this->r = this->a", 0): ["this->r", "this->a"],
              ("this->b = i", 0): ["this->b", "i"],
              ("this->i = i", 0): ["this->i", "i"],
              ("this->j = this->i", 0): ["this->j", "this->i"]},
         callmfn=[["<operator>.assignment", "<operator>.assignment"],
                  ["<operator>.indirectFieldAccess",
                   "<operator>.indirectFieldAccess"]],
         cite="c2cpg/.../passes/ast/Cpp17FeaturesTests.scala:14-36"),
    # C17:178-196 — auto deduction from braced-init-lists.
    dict(name="cpp17-auto-braced", lang="cpp", wrap=False, code="""
auto x1 = {1, 2, 3};
auto x2 {3};
auto x3 {3.0};
""",
         locals=[["<global>.x1", "auto x1|ANY"],
                 ["<global>.x2", "auto x2|int"],
                 ["<global>.x3", "auto x3|double"]],
         cite="c2cpg/.../passes/ast/Cpp17FeaturesTests.scala:178-196"),
    # C17:598-608 — direct list initialization of enums.
    dict(name="cpp17-enum-list-init", lang="cpp", wrap=False, code="""
enum byte : unsigned char {};
byte b {0};
byte d = byte{1};
""",
         locals=[["<global>.b", "byte b|byte"],
                 ["<global>.d", "byte d|byte"]],
         nodetype={("b", 0, "IDENTIFIER"): "byte",
                   ("d", 0, "IDENTIFIER"): "byte"},
         cite="c2cpg/.../passes/ast/Cpp17FeaturesTests.scala:598-608"),
    # C17:610-652 — [[fallthrough]]/[[nodiscard]]/[[maybe_unused]]
    # attributes are transparent: methods/params/jump targets survive.
    dict(name="cpp17-attrs", lang="cpp", wrap=False, code="""
void foo() {
  switch (n) {
    case 1:
      [[fallthrough]];
    case 2:
      break;
    case 3:
      [[fallthrough]];
    default:
      ;
  }
}

[[nodiscard]] bool do_something() {
  return is_success;
}
struct [[nodiscard]] error_info {
};

void my_callback(std::string msg, [[maybe_unused]] bool error) {
  log(msg);
}
""",
         methods=[["foo", "foo:void()"],
                  ["do_something", "do_something:bool()"],
                  ["my_callback", "my_callback:void(std.string,bool)"]],
         params=[["my_callback.msg", "1:std.string:BY_VALUE"],
                 ["my_callback.error", "2:bool:BY_VALUE"]],
         ast={("<empty>", 1): ["case 1:", "1", "case 2:", "2", "break;",
                               "case 3:", "3", "default:"]},
         cite="c2cpg/.../passes/ast/Cpp17FeaturesTests.scala:610-652"),
    # C17:298-309 — namespace aliases parse; the aliased class keeps its
    # canonical fullname.
    dict(name="cpp17-ns-alias", lang="cpp", wrap=False, code="""
namespace A {
  class Foo {};
}

namespace B = A;
auto f = B::Foo();
""",
         tdowner=[["Foo", "cpp17-ns-alias.cpp:<global>"]],
         cite="c2cpg/.../passes/ast/Cpp17FeaturesTests.scala:298-309"),

    # -- cpp/features20/Cpp20FeaturesTests.scala ----------------------- #
    # C20:193-212 — C++20 designated initializers on a declaration lower
    # to per-member assignments.
    dict(name="cpp20-designated", lang="cpp", wrap=False, code="""
struct A {
  int x;
  int y;
  int z = 123;
};

void foo() {
  A a {.x = 1, .z = 2};
}
""",
         ast={("a.x = 1", 0): ["a.x", "1"],
              ("a.z = 2", 0): ["a.z", "2"],
              ("a.x", 0): ["a", "x"]},
         callmfn=[["<operator>.assignment", "<operator>.assignment"],
                  ["<operator>.fieldAccess", "<operator>.fieldAccess"]],
         cite="c2cpg/.../cpp/features20/Cpp20FeaturesTests.scala:193-212"),
    # C20:415-429 — consteval strips from the immediate function's
    # signature; the constexpr local keeps its raw code.
    dict(name="cpp20-consteval", lang="cpp", wrap=False, code="""
consteval int sqr(int n) {
  return n * n;
}

void foo() {
  constexpr int r = sqr(100);
}
""",
         methods=[["sqr", "sqr:int(int)"], ["foo", "foo:void()"]],
         locals=[["foo.r", "constexpr int r|int"]],
         cite="c2cpg/.../cpp/features20/Cpp20FeaturesTests.scala:415-429"),
    # C20:431-462 — `using enum` bodies keep the case labels.
    dict(name="cpp20-using-enum", lang="cpp", wrap=False, code="""
enum class rgba_color_channel { red, green, blue, alpha };

std::string_view to_string(rgba_color_channel my_channel) {
  switch (my_channel) {
    using enum rgba_color_channel;
    case red:   return "red";
    case green: return "green";
    case blue:  return "blue";
    case alpha: return "alpha";
  }
}
""",
         methods=[["to_string",
                   "to_string:std.string_view(rgba_color_channel)"]],
         cite="c2cpg/.../cpp/features20/Cpp20FeaturesTests.scala:431-462"),
    # C20:505-517 — constinit drops from the CDT raw code; the function
    # signature strips constexpr.
    dict(name="cpp20-constinit", lang="cpp", wrap=False, code="""
constexpr const char* f(bool p) { return p ? "constant initializer" : g(); }

void foo() {
  constinit const char *c = f(true);
}
""",
         methods=[["f", "f:char*(bool)"], ["foo", "foo:void()"]],
         locals=[["foo.c", "const char *c|char*"]],
         cite="c2cpg/.../cpp/features20/Cpp20FeaturesTests.scala:505-517"),
    # -- passes/types/EnumTypeTests.scala remainder -------------------- #
    # ET:106-128 — typed enum: members adopt the underlying type, no
    # clinit without initializers.
    dict(name="cpp-enum-with-type", lang="cpp", wrap=False, code="""
enum smallenum: int
{
    a,
    b,
    c
};""",
         members=[["smallenum.a", "int"], ["smallenum.b", "int"],
                  ["smallenum.c", "int"]],
         tdcode=[["smallenum", "enum smallenum"]],
         cite="c2cpg/.../passes/types/EnumTypeTests.scala:106-128"),
    # ET:129-148 — anonymous enums get `<enum>N` names.
    dict(name="c-enum-anon", lang="c", wrap=False, code="""
enum
{
    d,
    e,
    f
};""",
         members=[["<enum>0.d", "int"], ["<enum>0.e", "int"],
                  ["<enum>0.f", "int"]],
         tdcode=[["<enum>0", "enum"]],
         cite="c2cpg/.../passes/types/EnumTypeTests.scala:129-148"),
    # ET:149-165 — the trailing declarator names the anonymous enum.
    dict(name="c-enum-anon-alias", lang="c", wrap=False, code="""
enum
{
    d,
    e,
    f
} testing;""",
         members=[["testing.d", "int"], ["testing.e", "int"],
                  ["testing.f", "int"]],
         cite="c2cpg/.../passes/types/EnumTypeTests.scala:149-165"),
    # ET:166-198 — `X::a` enum access is a fieldAccess.
    dict(name="cpp-enum-access", lang="cpp", wrap=False, code="""
enum X: int
{
    a,
    b
};
int x = X::a;
""",
         members=[["X.a", "int"], ["X.b", "int"]],
         ast={("x = X::a", 0): ["x", "X::a"],
              ("X::a", 0): ["X", "a"]},
         callmfn=[["<operator>.fieldAccess", "<operator>.fieldAccess"],
                  ["<operator>.assignment", "<operator>.assignment"]],
         cite="c2cpg/.../passes/types/EnumTypeTests.scala:166-198"),
    # -- passes/ast/MethodTests.scala remainder ------------------------ #
    # MT1:19-33 — main's C fullname/signature.
    dict(name="c-mt1-fields", lang="c", wrap=False, code="""
  int main(int argc, char **argv) {
  }""",
         methods=[["main", "main"]],
         msig=[["main", "int(int,char**)"]],
         nodetype={("RET", 0, "METHOD_RETURN"): "int"},
         cite="c2cpg/.../passes/ast/MethodTests.scala:19-33"),
    # MT1:39-41 — parameter names.
    dict(name="c-mt1-params", lang="c", wrap=False, code="""
  int main2(int argc, char **argv) {
  }""",
         params=[["main2.argc", "1:int:BY_VALUE"],
                 ["main2.argv", "2:char**:BY_VALUE"]],
         paramcode=[["main2.argc", "int argc"],
                    ["main2.argv", "char **argv"]],
         cite="c2cpg/.../passes/ast/MethodTests.scala:39-41"),
    # MT7:130-157 — METHOD/param/return fields.
    dict(name="c-mt7", lang="c", wrap=False, code="""
int foo(int x, int y) {

}
""",
         methods=[["foo", "foo"]],
         msig=[["foo", "int(int,int)"]],
         params=[["foo.x", "1:int:BY_VALUE"], ["foo.y", "2:int:BY_VALUE"]],
         paramcode=[["foo.x", "int x"], ["foo.y", "int y"]],
         nodetype={("RET", 0, "METHOD_RETURN"): "int"},
         cite="c2cpg/.../passes/ast/MethodTests.scala:130-175"),
    # MT8:195-254 — identifier REFs resolve to the nearest declaration:
    # method1's local, method2's parameter, method3's shadowing pairs.
    dict(name="c-mt8-ref-scoping", lang="c", wrap=False, code="""
void method1() {
  int x;
  x = 1;
}

void method2(int x) {
  x = 1;
}

void method3(int x) {
  int y;
  {
    int x;
    int y;

    x = 1;
    y = 1;
  }

  x = 1;
  y = 1;
}
""",
         refs={("x", 0, "IDENTIFIER"): ["int x&<empty>@0"],
               ("x", 1, "IDENTIFIER"): ["int x&method2@0"],
               ("x", 2, "IDENTIFIER"): ["int x&<empty>@3"],
               ("x", 3, "IDENTIFIER"): ["int x&method3@0"],
               ("y", 0, "IDENTIFIER"): ["int y&<empty>@3"],
               ("y", 1, "IDENTIFIER"): ["int y&<empty>@2"]},
         cite="c2cpg/.../passes/ast/MethodTests.scala:195-254"),
    # -- passes/ast/MacroHandlingTests.scala remainder ----------------- #
    # MH9:292-309 — un-parsable paste macros recover; the surrounding
    # declarations stay intact.
    dict(name="c-macro-unparsable", lang="c", wrap=False, code="""
#define A_THING(x) y ## y
int type_num(int x) { return x; }
int foo() {
  int z = type_num(2);
}
""",
         locals=[["foo.z", "int z|int"]],
         ast={("z = type_num(2)", 0): ["z", "type_num(2)"],
              ("type_num(2)", 0): ["2"]},
         callmfn=[["type_num", "type_num"],
                  ["<operator>.assignment", "<operator>.assignment"]],
         cite="c2cpg/.../passes/ast/MacroHandlingTests.scala:292-309"),
    # MH10:333-354 — each local keeps exactly one AST parent across
    # repeated macro expansions.
    dict(name="cpp-macro-deletereset", lang="cpp", wrap=False, code="""
#define deleteReset(ptr) do { delete ptr; ptr = nullptr; } while(0)
void func(void) {
  int *foo = new int;
  int *bar = new int;
  int *baz = new int;
  deleteReset(foo);
  deleteReset(bar);
  deleteReset(baz);
}
""",
         locals=[["func.foo", "int *foo|int*"],
                 ["func.bar", "int *bar|int*"],
                 ["func.baz", "int *baz|int*"]],
         cite="c2cpg/.../passes/ast/MacroHandlingTests.scala:333-354"),
    # MH10/11:356-380 — a broken-macro assignment creates no duplicate
    # local, and the macro method stubs exactly once.
    dict(name="c-macro-broken-local", lang="c", wrap=False, code="""
#define FOO() (long)va_arg(ap, int)
void func(void) {
  int foo;
  foo = FOO();
  foo = FOO();
}
""",
         locals=[["func.foo", "int foo|int"]],
         mcount=[["c-macro-broken-local.c:FOO:ANY(0)", 1],
                 ["func", 1]],
         cite="c2cpg/.../passes/ast/MacroHandlingTests.scala:356-380"),
    # -- AstCreationPassTests array-init region ------------------------ #
    # :1819-1862 — sized stack arrays: alloc with the raw-size code,
    # locals typed with the size expression.
    _c("c-array-size", "c", """
int main() {
  char bufA[256];
  char bufB[1+2];
}
""", "1819-1862",
       locals=[["main.bufA", "char bufA[256]|char[256]"],
               ["main.bufB", "char bufB[1+2]|char[1+2]"]],
       ast={("bufA[256]", 0): ["256"], ("bufB[1+2]", 0): ["1+2"]},
       callmfn=[["<operator>.alloc", "<operator>.alloc"]],
       nodetype={("bufA[256]", 0, "CALL"): "char[256]",
                 ("bufB[1+2]", 0, "CALL"): "char[1+2]"}),
    # :1863-1876 — `char str[] = "abc"` types char[]; NO alloc call.
    _c("c-empty-array-init", "c", """
void other(void) {
  int i = 0;
  char str[] = "abc";
  printf("%d %s", i, str);
}
""", "1863-1876",
       locals=[["other.i", "int i|int"],
               ["other.str", "char str[]|char[]"]],
       nodetype={("str", 0, "IDENTIFIER"): "char[]",
                 ("str", 1, "IDENTIFIER"): "char[]"}),
    # :1877-1902 — global array init: arrayInitializer with the literal
    # children in order.
    _c("c-array-init", "c", """
int x[] = {0, 1, 2, 3};
""", "1877-1902",
       locals=[["<global>.x", "int[] x|int[]"]],
       ast={("x = {0, 1, 2, 3}", 0): ["x", "{0, 1, 2, 3}"],
            ("{0, 1, 2, 3}", 0): ["0", "1", "2", "3"]},
       callmfn=[["<operator>.arrayInitializer",
                 "<operator>.arrayInitializer"],
                ["<operator>.assignment", "<operator>.assignment"]],
       nodetype={("x", 0, "IDENTIFIER"): "int[]"}),
    # :1904-1930
    _c("c-static-array-init", "c", """
static int x[] = {0, 1, 2, 3};
""", "1904-1930",
       ast={("x = {0, 1, 2, 3}", 0): ["x", "{0, 1, 2, 3}"],
            ("{0, 1, 2, 3}", 0): ["0", "1", "2", "3"]},
       nodetype={("x", 0, "IDENTIFIER"): "int[]"}),
    # :1931-1957
    _c("c-const-array-init", "c", """
const int x[] = {0, 1, 2, 3};
""", "1931-1957",
       ast={("x = {0, 1, 2, 3}", 0): ["x", "{0, 1, 2, 3}"],
            ("{0, 1, 2, 3}", 0): ["0", "1", "2", "3"]},
       nodetype={("x", 0, "IDENTIFIER"): "int[]"}),
    # NamespaceBlockTests:37-42 — namespace block -> method traversal.
    dict(name="c-nsblock-methods", lang="c", wrap=False, code="""
int foo() {}
struct my_struct{};
""",
         methods=[["foo", "foo"]],
         cite="c2cpg/.../passes/ast/NamespaceBlockTests.scala:37-42"),
    # NamespaceBlockTests:44-53 — namespace block -> type decl traversal.
    dict(name="c-nsblock-typedecl", lang="c", wrap=False, code="""
int foo2() {}
struct my_struct{};
""",
         tdowner=[["my_struct", "c-nsblock-typedecl.c:<global>"]],
         cite="c2cpg/.../passes/ast/NamespaceBlockTests.scala:44-53"),
    # :1102-1109 — empty named struct keeps its TYPE_DECL.
    _c("c-empty-struct", "c", """
 struct foo {
 };
""", "1102-1109",
       tdcode=[["foo", "struct foo"]],
       tdowner=[["foo", "c-empty-struct.c:<global>"]]),
    # :1110-1116 — a bare forward declaration keeps a bodyless TYPE_DECL.
    _c("c-struct-fwd-decl", "c", """
 struct foo;
""", "1110-1116",
       tdcode=[["foo", "struct foo"]],
       tdowner=[["foo", "c-struct-fwd-decl.c:<global>"]]),
]

# -- passes/ast/CallTests.scala breadth -------------------------------- #
_CT_ADD = """
int add(int x, int y) {
  return x + y;
}
int main(int argc, char **argv) {
  printf("%d\\n", add((1+2), 3));
}
"""

CASES += [
    # CAT:24-35 — the add call keeps code/name; C fullname is the bare name.
    dict(name="c-call-add-fields", lang="c", wrap=False, code=_CT_ADD,
         callmfn=[["add", "add"], ["printf", "printf"],
                  ["<operator>.addition", "<operator>.addition"]],
         cite="c2cpg/.../passes/ast/CallTests.scala:24-35"),
    # CAT:37-53 — argument shapes: (1+2) addition + literal 3.
    dict(name="c-call-add-args", lang="c", wrap=False, code=_CT_ADD,
         ast={("add((1+2), 3)", 0): ["1+2", "3"],
              ("1+2", 0): ["1", "2"]},
         cite="c2cpg/.../passes/ast/CallTests.scala:37-53"),
    # CAT:55-63 — call-to-method / call-to-callee traversals.
    dict(name="c-call-add-traversals", lang="c", wrap=False, code=_CT_ADD,
         calls=[["main", "add"], ["main", "printf"]],
         cite="c2cpg/.../passes/ast/CallTests.scala:55-63"),
    # CAT:207-238 — non-virtual member call: resolved mfn, receiver `a`.
    dict(name="cpp-call-nonvirtual", lang="cpp", wrap=False, code="""
namespace NNN {
  class A {
    public:
      void foo(int a){}
  };
}

void outer() {
  NNN::A a;
  a.foo(1);
}
""",
         callmfn=[["foo", "NNN.A.foo:void(int)"]],
         ast={("a.foo(1)", 0): ["a", "1"]},
         cite="c2cpg/.../passes/ast/CallTests.scala:207-238"),
    # CAT:240-272 — virtual member call resolves identically.
    dict(name="cpp-call-virtual", lang="cpp", wrap=False, code="""
namespace NNN {
  class A {
    public:
      virtual void foo(int a){}
  };
}

void outer() {
  NNN::A a;
  a.foo(1);
}
""",
         callmfn=[["foo", "NNN.A.foo:void(int)"]],
         cite="c2cpg/.../passes/ast/CallTests.scala:240-272"),
    # CAT:300-323 — direct lambda invocation binds `<operator>()` with the
    # lambda's signature.
    dict(name="cpp-call-lambda-explicit", lang="cpp", wrap=False, code="""
void outer() {
  [](int a) -> int { return a; }(1);
}
""",
         callmfn=[["<operator>()", "<operator>():int(int)"]],
         ast={("[](int a) -> int { return a; }(1)", 0):
                  ["<lambda>", "1"]},
         cite="c2cpg/.../passes/ast/CallTests.scala:300-323"),
    # CAT:325-348 — inferred-return lambda invocation.
    dict(name="cpp-call-lambda-inferred", lang="cpp", wrap=False, code="""
void outer() {
  [](int a) {}(1);
}
""",
         callmfn=[["<operator>()", "<operator>():void(int)"]],
         cite="c2cpg/.../passes/ast/CallTests.scala:325-348"),
    # CAT:448-469 — C standalone call keeps the bare-name fullname.
    dict(name="c-call-standalone", lang="c", wrap=False, code="""
void foo(int) {}
void outer() {
  foo(1);
}
""",
         callmfn=[["foo", "foo"]],
         ast={("foo(1)", 0): ["1"]},
         cite="c2cpg/.../passes/ast/CallTests.scala:448-469"),
    # CAT:471-498 — extern "C" functions keep C naming in C++ units.
    dict(name="cpp-call-externc", lang="cpp", wrap=False, code="""
extern "C" {
  void foo(int a){}
}

void outer() {
  foo(1);
}
""",
         callmfn=[["foo", "foo"]],
         cite="c2cpg/.../passes/ast/CallTests.scala:471-498"),

    # :2530-2540 — array types keep the size in members, params, locals.
    _c("c-array-type-consistency", "c", """
struct x { char z[1]; };
void a(char y[1]) {
  char x[1];
}
""", "2530-2540",
       members=[["x.z", "char[1]"]],
       params=[["a.y", "1:char[1]:BY_VALUE"]],
       locals=[["a.x", "char x[1]|char[1]"]]),
    # :2542-2556 — macro-sized array: type uses the EXPANDED size, code
    # keeps the raw spelling, and the decl emits an <operator>.alloc
    # carrying the expanded literal.
    _c("c-array-type-macro", "c", """
#define BUFSIZE 0x111111111111111
void copy(char *string) {
	char buf[BUFSIZE];
	stpncpy(buf, string, BUFSIZE);
}
""", "2542-2556",
       locals=[["copy.buf",
                "char buf[BUFSIZE]|char[0x111111111111111]"]],
       ast={("buf[BUFSIZE]", 0, "CALL"): ["0x111111111111111"]},
       callmfn=[["<operator>.alloc", "<operator>.alloc"]]),
    # :2517-2528 — pointer types stay consistent across member, param,
    # local, and return.
    _c("c-pointer-type-consistency", "c", """
struct x { char * z; };
char *a(char *y) {
  char *x;
}
""", "2517-2528",
       members=[["x.z", "char*"]],
       params=[["a.y", "1:char*:BY_VALUE"]],
       locals=[["a.x", "char *x|char*"]],
       nodetype={("RET", 0, "METHOD_RETURN"): "char*"}),
    # :1521-1540 — `Foo x = Foo{0}`: brace-ctor expression lowers to the
    # tmp block with the resolved ctor call (args &<tmp>0, 0).
    _c("cpp-ctor-expr", "cpp", """
class Foo {
public:
 Foo(int i) {  };
};
Foo x = Foo{0};
""", "1521-1540",
       ast={("x = Foo{0}", 0): ["x", "<empty>"],
            ("Foo{0}", 0): ["&<tmp>0", "0"],
            ("&<tmp>0", 0): ["<tmp>0"]},
       callmfn=[["Foo", "Foo.Foo:void(int)"],
                ["<operator>.assignment", "<operator>.assignment"],
                ["<operator>.alloc", "<operator>.alloc"],
                ["<operator>.addressOf", "<operator>.addressOf"]],
       methods=[["Foo", "Foo.Foo:void(int)"]]),
    # :1542-1556 — call argument linkage.
    _c("c-method-calls2", "c", """
void foo(int x) {
  bar(x);
}
""", "1542-1556",
       ast={("bar(x)", 0): ["x"]},
       calls=[["foo", "bar"]]),
    # :1558-1575 — RETURN wraps the multiplication as its only child.
    _c("c-method-returns", "c", """
int d(int x) {
  return x * 2;
}
""", "1558-1575",
       ast={("return x * 2;", 0): ["x * 2"],
            ("x * 2", 0): ["x", "2"]},
       callmfn=[["<operator>.multiplication",
                 "<operator>.multiplication"]]),
    # :1585-1593 — logicalNot over the bare identifier.
    _c("c-unary-method-calls", "c", """
bool invert(bool b) {
  return !b;
}
""", "1585-1593",
       ast={("!b", 0): ["b"], ("return !b;", 0): ["!b"]}),
    # :1594-1610 — C cast inside a conditional: TYPE_REF(int) + the
    # subtraction at argument 2.
    _c("c-unary-expr-cast", "c", """
int strnlen (const char *str, int max)
    {
      const char *end = memchr(str, 0, max);
      return end ? (int)(end - str) : max;
    }
""", "1594-1610",
       ast={("(int)(end - str)", 0): ["int", "end - str"],
            ("end - str", 0): ["end", "str"]},
       callmfn=[["<operator>.cast", "<operator>.cast"],
                ["<operator>.subtraction", "<operator>.subtraction"],
                ["<operator>.conditional", "<operator>.conditional"],
                ["<operator>.assignment", "<operator>.assignment"],
                ["memchr", "memchr"]],
       nodetype={("(int)(end - str)", 0, "CALL"): "int",
                 ("int", 0, "TYPE_REF"): "int"}),
    # :1611-1622 — post-increment/-decrement argument is x.
    _c("c-post-incr", "c", """
int foo(int x) {
  int sub = x--;
  int pos = x++;
  return pos;
}
""", "1611-1622",
       ast={("x++", 0): ["x"], ("x--", 0): ["x"]},
       callmfn=[["<operator>.postIncrement", "<operator>.postIncrement"],
                ["<operator>.postDecrement", "<operator>.postDecrement"],
                ["<operator>.assignment", "<operator>.assignment"]]),
    # :1623-1631 — conditional argument codes (cond, true, false).
    _c("c-cond-calls", "c", """
int abs(int x) {
  return x > 0 ? x : -x;
}
""", "1623-1631",
       ast={("x > 0 ? x : -x", 0): ["x > 0", "x", "-x"],
            ("-x", 0): ["x"]}),
    # :1632-1643 — sizeof-on-type argument is an IDENTIFIER named `int`.
    _c("c-sizeof-type", "c", """
size_t int_size() {
  return sizeof(int);
}
""", "1632-1643",
       ast={("sizeof(int)", 0): ["int"]},
       nodetype={("int", 0, "IDENTIFIER"): "int"}),
    # :1644-1648 — empty labelled statement keeps the `label:;` code.
    _c("c-label-stmt", "c", "void foo() { label:; }", "1644-1648",
       ast={("<empty>", 0): ["label:;"]}),
    # :1649-1657 — C array subscripts lower to indirectIndexAccess.
    _c("c-array-index", "c", """
int head(int x[]) {
  return x[0];
}
""", "1649-1657",
       ast={("x[0]", 0): ["x", "0"]},
       callmfn=[["<operator>.indirectIndexAccess",
                 "<operator>.indirectIndexAccess"]]),
    # :1658-1685 — C-style cast: TYPE_REF keeps the raw `Bar` code with
    # the namespace-resolved B.Bar type; f keeps A.Foo.
    _c("cpp-c-style-cast", "cpp", """
namespace A {
  class Foo {};
}
namespace B {
  class Bar {};
}

using namespace A;
using namespace B;

Bar cast(Foo f) {
  return (Bar) f;
}
""", "1658-1685",
       ast={("(Bar) f", 0): ["Bar", "f"]},
       callmfn=[["<operator>.cast", "<operator>.cast"]],
       nodetype={("Bar", 0, "TYPE_REF"): "B.Bar",
                 ("f", 0, "IDENTIFIER"): "A.Foo"}),
    # :2104-2125 — `new Foo(n, 42)`: block form with the resolved ctor.
    _c("cpp-new-object", "cpp", """
class Foo {
  public:
    Foo(int i, int j) {};
};
Foo* alloc(int n) {
   Foo* foo = new Foo(n, 42);
   return foo;
}
""", "2104-2125",
       ast={("new Foo(n, 42)", 1): ["&<tmp>0", "n", "42"],
            ("&<tmp>0", 0): ["<tmp>0"],
            ("<tmp>0 = <operator>.alloc", 0):
                ["<tmp>0", "<operator>.alloc"]},
       callmfn=[["Foo", "Foo.Foo:void(int,int)"],
                ["<operator>.new", "<operator>.new"],
                ["<operator>.alloc", "<operator>.alloc"],
                ["<operator>.addressOf", "<operator>.addressOf"],
                ["<operator>.assignment", "<operator>.assignment"]],
       methods=[["Foo", "Foo.Foo:void(int,int)"]]),
    # :2127-2137 — delete keeps its operand.
    _c("cpp-delete", "cpp", """
int delete_number(int* n) {
  delete n;
}
""", "2127-2137",
       ast={("delete n", 0): ["n"]},
       callmfn=[["<operator>.delete", "<operator>.delete"]]),
    # :2139-2149 — array delete keeps the `delete[]` code.
    _c("cpp-delete-array", "cpp", """
void delete_number(int n[]) {
  delete[] n;
}
""", "2139-2149",
       ast={("delete[] n", 0): ["n"]},
       callmfn=[["<operator>.delete", "<operator>.delete"]]),
    # :2151-2170 — const_cast: raw `int` TYPE_REF + float operand.
    _c("cpp-const-cast", "cpp", """
void foo(float n) {
  int y = const_cast<int>(n);
  return;
}
""", "2151-2170",
       ast={("const_cast<int>(n)", 0): ["int", "n"]},
       callmfn=[["<operator>.cast", "<operator>.cast"],
                ["<operator>.assignment", "<operator>.assignment"]],
       nodetype={("int", 0, "TYPE_REF"): "int",
                 ("n", 0, "IDENTIFIER"): "float",
                 ("const_cast<int>(n)", 0, "CALL"): "int"}),
    # :2171-2190
    _c("cpp-static-cast", "cpp", """
void foo(float n) {
  int y = static_cast<int>(n);
  return;
}
""", "2171-2190",
       ast={("static_cast<int>(n)", 0): ["int", "n"]},
       nodetype={("int", 0, "TYPE_REF"): "int",
                 ("n", 0, "IDENTIFIER"): "float"}),
    # :2191-2210
    _c("cpp-dynamic-cast", "cpp", """
void foo(float n) {
  int y = dynamic_cast<int>(n);
  return;
}
""", "2191-2210",
       ast={("dynamic_cast<int>(n)", 0): ["int", "n"]},
       nodetype={("int", 0, "TYPE_REF"): "int",
                 ("n", 0, "IDENTIFIER"): "float"}),
    # :2211-2230
    _c("cpp-reinterpret-cast", "cpp", """
void foo(float n) {
  int y = reinterpret_cast<int>(n);
  return;
}
""", "2211-2230",
       ast={("reinterpret_cast<int>(n)", 0): ["int", "n"]},
       nodetype={("int", 0, "TYPE_REF"): "int",
                 ("n", 0, "IDENTIFIER"): "float"}),
    # :2231-2266 — C designated array initializers: each designator is an
    # assignment child; ranges become arrayInitializer(lo, hi).
    _c("c-designated-array", "c", """
void foo() {
  int a[3] = { [1] = 5, [2] = 10, [3 ... 9] = 15 };
};
""", "2231-2266",
       ast={("{ [1] = 5, [2] = 10, [3 ... 9] = 15 }", 0):
                ["[1] = 5", "[2] = 10", "[3 ... 9] = 15"],
            ("[1] = 5", 0): ["1", "5"],
            ("[2] = 10", 0): ["2", "10"],
            ("[3 ... 9] = 15", 0): ["[3 ... 9]", "15"],
            ("[3 ... 9]", 0): ["3", "9"]},
       callmfn=[["<operator>.arrayInitializer",
                 "<operator>.arrayInitializer"],
                ["<operator>.assignment", "<operator>.assignment"]]),
    # :2268-2306 — the C++ spelling of the same fixture.
    _c("cpp-designated-array", "cpp", """
void foo() {
  int a[3] = { [1] = 5, [2] = 10, [3 ... 9] = 15 };
};
""", "2268-2306",
       ast={("{ [1] = 5, [2] = 10, [3 ... 9] = 15 }", 0):
                ["[1] = 5", "[2] = 10", "[3 ... 9] = 15"],
            ("[3 ... 9] = 15", 0): ["[3 ... 9]", "15"]},
       callmfn=[["<operator>.arrayInitializer",
                 "<operator>.arrayInitializer"],
                ["<operator>.assignment", "<operator>.assignment"]]),
    # :2308-2335 — C struct designated initializers.
    _c("c-designated-struct", "c", """
void foo() {
  struct foo b = { .a = 1, .b = 2 };
};
""", "2308-2335",
       ast={("{ .a = 1, .b = 2 }", 0): [".a = 1", ".b = 2"],
            (".a = 1", 0): ["a", "1"],
            (".b = 2", 0): ["b", "2"]},
       callmfn=[["<operator>.arrayInitializer",
                 "<operator>.arrayInitializer"],
                ["<operator>.assignment", "<operator>.assignment"]]),
    # :2337-2354 — C++ designated struct init lowers to per-member
    # assignments `point3D.x = 1`.
    _c("cpp-designated-struct", "cpp", """
class Point3D {
  public:
    int x;
    int y;
    int z;
};

void foo() {
  Point3D point3D { .x = 1, .y = 2, .z = 3 };
};
""", "2337-2354",
       ast={("point3D.x = 1", 0): ["point3D.x", "1"],
            ("point3D.y = 2", 0): ["point3D.y", "2"],
            ("point3D.z = 3", 0): ["point3D.z", "3"],
            ("point3D.x", 0): ["point3D", "x"]},
       callmfn=[["<operator>.assignment", "<operator>.assignment"],
                ["<operator>.fieldAccess", "<operator>.fieldAccess"]]),
    # :2356-2375 — pack-expansion call argument keeps the bare code.
    _c("cpp-pack-call", "cpp", """
void foo(int x, int*... args) {
  foo(x, args...);
};
""", "2356-2375",
       ast={("foo(x, args...)", 0): ["x", "args"]},
       calls=[["foo", "foo"]]),
    # :2376-2388 — file-level ASM keeps an UNKNOWN node (asserted through
    # its presence in the global body with the raw `asm(` code).
    _c("c-asm-global", "c", """
asm(
 "  push %ebp       \\n"
 "  movl %esp, %ebp \\n"
 "  push %ebx       \\n"
);
""", "2376-2388",
       ast={("<global>", 0): ["<empty>", "RET"]}),
    # :2403-2424 — GNU statement expressions: each BLOCK holds the local,
    # the assignment, and the trailing value identifier.
    _c("c-compound-expr", "c", """
int x = ({int y = 1; y;}) + ({int z = 2; z;});
""", "2403-2424",
       ast={("<empty>", 1): ["int y", "y = 1", "y"],
            ("<empty>", 2): ["int z", "z = 2", "z"],
            ("y = 1", 0): ["y", "1"],
            ("z = 2", 0): ["z", "2"]},
       locals=[["<global>.x", "int x|int"],
               ["<global>.y", "int y|int"],
               ["<global>.z", "int z|int"]]),
    # :1686-1703 — `new int[n]`: <operator>.new wrapping an
    # <operator>.alloc whose args are the element TYPE_REF and the size.
    _c("cpp-new-array", "cpp", """
int * alloc(int n) {
   int * arr = new int[n];
   return arr;
}
""", "1686-1703",
       ast={("arr = new int[n]", 0): ["arr", "new int[n]"],
            ("new int[n]", 0, "CALL"): ["new int[n]"],
            ("new int[n]", 1, "CALL"): ["int", "n"]},
       callmfn=[["<operator>.new", "<operator>.new"],
                ["<operator>.alloc", "<operator>.alloc"],
                ["<operator>.assignment", "<operator>.assignment"]]),
]
