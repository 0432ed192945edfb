"""Java local-class capture-lowering parity corpus, per-`in{}` expansion —
transcribed BY HAND from javasrc2cpg/src/test/scala/io/joern/javasrc2cpg/
querying/LocalClassTests.scala groups 1-5 (:10-552), one parity case per
reference `in { }` block with its line-range cite.

Line/column-number assertions have no parity relation and are covered by
the pytest frontend suites; everything else is transcribed: typeDecl
identity through BINDING rows (the fullName lives in the bound method
fullnames), capture members with empty-set markers for the
must-NOT-exist names, ctor parameter synthesis (this/outerClass/captures
with exact indices), and the `this.X = X` capture assignments with their
REF targets.
"""

JQ = "javasrc2cpg/src/test/scala/io/joern/javasrc2cpg/querying"
_S = f"{JQ}/LocalClassTests.scala"

_LOCAL_FN = "foo.Foo.enclosingMethod:void(int).Local"

_A = """
package foo;

class Foo {
    int capturedMember;
    static int staticMember;

    void enclosingMethod(int capturedParam) {
        int capturedLocal = 1;
        class Local {
            void noCaptures(int localParam) {
                sink(localParam);
            }

            void capturesParam() {
                sink(capturedParam);
            }

            void capturesMember() {
                sink(capturedMember);
            }

            void capturesLocal() {
                sink(capturedLocal);
            }

            void staticAccess() {
                sink(staticMember);
            }
        };
    }
}
"""

_B = """
package foo;

class Foo {
    int member;
    static int staticMember;

    static void enclosingMethod(int capturedParam) {
        int capturedLocal = 1;
        class Local {
            void noCaptures(int localParam) {
                sink(localParam);
            }

            void capturesParam() {
                sink(capturedParam);
            }

            void capturesMember() {
                sink(member);
            }

            void staticAccess() {
                sink(staticMember);
            }

            void capturesLocal() {
                sink(capturedLocal);
            }
        };
    }
}
"""

_C = """
package foo;

class Foo {
    void enclosingMethod(int outerParam) {
        int outerLocal = 2;
        class Local {
            String foo() {
                return "Local";
            }
        };
        Local l = new Local();
    }
}
"""

_D = """
package foo;

class Foo {
    static void enclosingMethod(int outerParam) {
        int outerLocal = 2;
        class Local {
            String foo() {
                return "Local";
            }
        };
    }
}
"""

_E = """
package foo;

class Foo {
    int capturedMember;
    static int staticMember;

    void enclosingMethod(int capturedParam) {
        int capturedLocal = 1;
        class Local {
            void noCaptures(int localParam) {
                sink(localParam);
            }

            void capturesMember() {
                sink(capturedMember);
            }

            void capturesLocal() {
                sink(capturedLocal);
            }

            void staticAccess() {
                sink(staticMember);
            }
        };
    }
}
"""

_CTOR_BINDING = ["Local:<init>", f"void()->{_LOCAL_FN}.<init>:void()"]


def _c(name, code, cite_lines, **rels):
    return dict(name=name, lang="java", wrap=False, code=code,
                cite=f"{_S}:{cite_lines}", **rels)


CASES = [
    # ---- group 1: "simple local classes" (:10-183) ------------------- #
    # :47-49 — exactly one Local typeDecl at the method-scoped fullname.
    _c("java-lc2-a-typedecl", _A, "47-49", bindings=[_CTOR_BINDING]),
    # :51-57 — method binding rows carry the local-class fullname.
    _c("java-lc2-a-bindings", _A, "51-57",
       bindings=[["Local:noCaptures",
                  f"void(int)->{_LOCAL_FN}.noCaptures:void(int)"]]),
    # :59-66 — default-ctor binding.
    _c("java-lc2-a-ctor-binding", _A, "59-66", bindings=[_CTOR_BINDING]),
    # :68-70 — typeDecl code.
    _c("java-lc2-a-code", _A, "68-70",
       tdcode=[["Local", "class Local"], ["Foo", "class Foo"]]),
    # :72-74 — implicit Object super.
    _c("java-lc2-a-inherits", _A, "72-74",
       inherits=[["Local", "java.lang.Object"],
                 ["Foo", "java.lang.Object"]]),
    # :81-83 — exactly 3 capture members (outerClass + the two captures);
    # empty-set markers assert staticMember/capturedMember are NOT members.
    _c("java-lc2-a-member-count", _A, "81-83",
       members=[["Local.outerClass", "foo.Foo"],
                ["Local.capturedParam", "int"],
                ["Local.capturedLocal", "int"],
                ["Local.staticMember", ""],
                ["Local.capturedMember", ""]]),
    # :85-87
    _c("java-lc2-a-outer-member", _A, "85-87",
       members=[["Local.outerClass", "foo.Foo"]]),
    # :89-91
    _c("java-lc2-a-param-member", _A, "89-91",
       members=[["Local.capturedParam", "int"]]),
    # :93-95
    _c("java-lc2-a-local-member", _A, "93-95",
       members=[["Local.capturedLocal", "int"]]),
    # :97-99
    _c("java-lc2-a-no-static-member", _A, "97-99",
       members=[["Local.staticMember", ""]]),
    # :101-103
    _c("java-lc2-a-no-captured-member", _A, "101-103",
       members=[["Local.capturedMember", ""]]),
    # :105-125 — ctor params this(0)/outerClass(1)/capturedLocal(2)/
    # capturedParam(3); the '<init>' subject also covers Foo's default ctor.
    _c("java-lc2-a-ctor-params", _A, "105-125",
       params=[["<init>.this", f"0:{_LOCAL_FN}:BY_SHARING"],
               ["<init>.this", "0:foo.Foo:BY_SHARING"],
               ["<init>.outerClass", "1:foo.Foo:BY_SHARING"],
               ["<init>.capturedLocal", "2:int:BY_VALUE"],
               ["<init>.capturedParam", "3:int:BY_VALUE"]]),
    # :127-182 — `this.X = X` assignments in the ctor body, each REF-ing
    # the matching ctor parameter.
    _c("java-lc2-a-ctor-assigns", _A, "127-182",
       ast={("this.outerClass = outerClass", 0):
                ["this.outerClass", "outerClass"],
            ("this.outerClass", 0): ["this", "outerClass"],
            ("this.capturedLocal = capturedLocal", 0):
                ["this.capturedLocal", "capturedLocal"],
            ("this.capturedLocal", 0): ["this", "capturedLocal"],
            ("this.capturedParam = capturedParam", 0):
                ["this.capturedParam", "capturedParam"],
            ("this.capturedParam", 0): ["this", "capturedParam"]},
       refs={("outerClass", 0, "IDENTIFIER"):
                 ["foo.Foo outerClass&<init>@0"],
             ("capturedLocal", 2, "IDENTIFIER"):
                 ["int capturedLocal&<init>@0"],
             ("capturedParam", 1, "IDENTIFIER"):
                 ["int capturedParam&<init>@0"]}),

    # ---- group 2: "local classes in a static context" (:184-307) ----- #
    # :222-224
    _c("java-lc2-b-typedecl", _B, "222-224", bindings=[_CTOR_BINDING]),
    # :226-228 — exactly 2 members: no outerClass in a static context.
    _c("java-lc2-b-member-count", _B, "226-228",
       members=[["Local.capturedParam", "int"],
                ["Local.capturedLocal", "int"],
                ["Local.outerClass", ""],
                ["Local.staticMember", ""],
                ["Local.member", ""]]),
    # :230-232
    _c("java-lc2-b-no-outer-member", _B, "230-232",
       members=[["Local.outerClass", ""]]),
    # :234-236
    _c("java-lc2-b-param-member", _B, "234-236",
       members=[["Local.capturedParam", "int"]]),
    # :238-240
    _c("java-lc2-b-local-member", _B, "238-240",
       members=[["Local.capturedLocal", "int"]]),
    # :242-244
    _c("java-lc2-b-no-static-member", _B, "242-244",
       members=[["Local.staticMember", ""]]),
    # :246-248
    _c("java-lc2-b-no-captured-member", _B, "246-248",
       members=[["Local.capturedMember", ""]]),
    # :250-266 — ctor params shift down without outerClass.
    _c("java-lc2-b-ctor-params", _B, "250-266",
       params=[["<init>.this", f"0:{_LOCAL_FN}:BY_SHARING"],
               ["<init>.this", "0:foo.Foo:BY_SHARING"],
               ["<init>.capturedLocal", "1:int:BY_VALUE"],
               ["<init>.capturedParam", "2:int:BY_VALUE"]]),
    # :268-305 — capture assignments without the outerClass row.
    _c("java-lc2-b-ctor-assigns", _B, "268-305",
       ast={("this.capturedLocal = capturedLocal", 0):
                ["this.capturedLocal", "capturedLocal"],
            ("this.capturedLocal", 0): ["this", "capturedLocal"],
            ("this.capturedParam = capturedParam", 0):
                ["this.capturedParam", "capturedParam"],
            ("this.capturedParam", 0): ["this", "capturedParam"]},
       refs={("capturedLocal", 2, "IDENTIFIER"):
                 ["int capturedLocal&<init>@0"],
             ("capturedParam", 1, "IDENTIFIER"):
                 ["int capturedParam&<init>@0"]}),

    # ---- group 3: obj creation, unused captures (:309-375) ----------- #
    # :328-330
    _c("java-lc2-c-typedecl", _C, "328-330",
       bindings=[_CTOR_BINDING,
                 ["Local:foo",
                  f"java.lang.String()->{_LOCAL_FN}.foo:java.lang.String()"]]),
    # :332-337 — outerClass is the ONLY member.
    _c("java-lc2-c-outer-member", _C, "332-337",
       members=[["Local.outerClass", "foo.Foo"]]),
    # :339-351
    _c("java-lc2-c-ctor-params", _C, "339-351",
       params=[["<init>.this", f"0:{_LOCAL_FN}:BY_SHARING"],
               ["<init>.this", "0:foo.Foo:BY_SHARING"],
               ["<init>.outerClass", "1:foo.Foo:BY_SHARING"]]),
    # :353-374 — plus: `new Local()` resolves to the local-class ctor and
    # `l` is typed at the method-scoped fullname.
    _c("java-lc2-c-ctor-assign", _C, "353-374",
       ast={("this.outerClass = outerClass", 0):
                ["this.outerClass", "outerClass"],
            ("this.outerClass", 0): ["this", "outerClass"]},
       callmfn=[["<init>", f"{_LOCAL_FN}.<init>:void()"]],
       locals=[["enclosingMethod.l", f"Local l|{_LOCAL_FN}"],
               ["enclosingMethod.outerLocal", "int outerLocal|int"]]),

    # ---- group 4: static obj creation, no captures (:377-415) -------- #
    # :395-397
    _c("java-lc2-d-typedecl", _D, "395-397",
       bindings=[_CTOR_BINDING,
                 ["Local:foo",
                  f"java.lang.String()->{_LOCAL_FN}.foo:java.lang.String()"]]),
    # :399-401 — no members at all.
    _c("java-lc2-d-no-members", _D, "399-401",
       members=[["Local.outerClass", ""]]),
    # :403-410 — ctor takes only this.
    _c("java-lc2-d-ctor-params", _D, "403-410",
       params=[["<init>.this", f"0:{_LOCAL_FN}:BY_SHARING"],
               ["<init>.this", "0:foo.Foo:BY_SHARING"],
               ["<init>.outerClass", ""]]),
    # :412-414 — empty ctor body: the METHOD's only children are the
    # implicit this, an empty block, and RET.
    _c("java-lc2-d-empty-ctor", _D, "412-414",
       ast={("<init>", 0): ["this", "<empty>", "RET"],
            ("<init>", 1): ["this", "<empty>", "RET"]}),

    # ---- group 5: some used + some unused captures (:417-552) -------- #
    # :450-452
    _c("java-lc2-e-typedecl", _E, "450-452", bindings=[_CTOR_BINDING]),
    # :454-456 — fullname via the ctor binding (identical fact set).
    _c("java-lc2-e-fullname", _E, "454-456", bindings=[_CTOR_BINDING]),
    # :458-460
    _c("java-lc2-e-code", _E, "458-460",
       tdcode=[["Local", "class Local"], ["Foo", "class Foo"]]),
    # :462-464
    _c("java-lc2-e-inherits", _E, "462-464",
       inherits=[["Local", "java.lang.Object"],
                 ["Foo", "java.lang.Object"]]),
    # :471-473 — exactly 2 members: the UNUSED capturedParam gets none.
    _c("java-lc2-e-member-count", _E, "471-473",
       members=[["Local.outerClass", "foo.Foo"],
                ["Local.capturedLocal", "int"],
                ["Local.capturedParam", ""],
                ["Local.staticMember", ""],
                ["Local.capturedMember", ""]]),
    # :475-477
    _c("java-lc2-e-outer-member", _E, "475-477",
       members=[["Local.outerClass", "foo.Foo"]]),
    # :479-481
    _c("java-lc2-e-no-unused-member", _E, "479-481",
       members=[["Local.capturedParam", ""]]),
    # :483-485
    _c("java-lc2-e-local-member", _E, "483-485",
       members=[["Local.capturedLocal", "int"]]),
    # :487-489
    _c("java-lc2-e-no-static-member", _E, "487-489",
       members=[["Local.staticMember", ""]]),
    # :491-493
    _c("java-lc2-e-no-captured-member", _E, "491-493",
       members=[["Local.capturedMember", ""]]),
    # :495-511 — ctor params only for USED captures.
    _c("java-lc2-e-ctor-params", _E, "495-511",
       params=[["<init>.this", f"0:{_LOCAL_FN}:BY_SHARING"],
               ["<init>.this", "0:foo.Foo:BY_SHARING"],
               ["<init>.outerClass", "1:foo.Foo:BY_SHARING"],
               ["<init>.capturedLocal", "2:int:BY_VALUE"],
               ["<init>.capturedParam", ""]]),
    # :513-551 — assignments only for used captures.
    _c("java-lc2-e-ctor-assigns", _E, "513-551",
       ast={("this.outerClass = outerClass", 0):
                ["this.outerClass", "outerClass"],
            ("this.outerClass", 0): ["this", "outerClass"],
            ("this.capturedLocal = capturedLocal", 0):
                ["this.capturedLocal", "capturedLocal"],
            ("this.capturedLocal", 0): ["this", "capturedLocal"]},
       refs={("outerClass", 0, "IDENTIFIER"):
                 ["foo.Foo outerClass&<init>@0"],
             ("capturedLocal", 2, "IDENTIFIER"):
                 ["int capturedLocal&<init>@0"]}),
]
