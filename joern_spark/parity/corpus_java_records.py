"""Java record parity corpus — transcribed BY HAND from
javasrc2cpg/src/test/scala/io/joern/javasrc2cpg/querying/RecordTests.scala
(one parity case per reference `in { }` block, citing its line range).

Records lower exactly as the reference asserts: implicit
java.lang.Record super, a canonical constructor carrying the record
components as parameters plus the trailing implicit `this.x = x`
assignments (compact constructors get them appended after the body), a
private final member per component, and a public accessor method per
component returning `this.x`.  Modifier-node sub-assertions (PRIVATE,
FINAL) have no standalone parity relation and are covered by the pytest
frontend suites instead.
"""

JQ = "javasrc2cpg/src/test/scala/io/joern/javasrc2cpg/querying"
_S = f"{JQ}/RecordTests.scala"

_COMPACT = """
package foo;

record Foo(String value) {
  public Foo {
    System.out.println(value);
  }
}
"""

_NONCANON = """
package foo;

record Foo(String value) {
    public Foo() {
        this.value = "value";
    }
}
"""

_CANON = """
package foo;

record Foo(String value) {
    public Foo(String value) {
        System.out.println(value);
        this.value = value;
    }
}
"""

_GENERIC = """
package foo;

record Foo<T>(T value) {}
"""

_SIMPLE = """
package foo;

record Foo(String value) {}
"""

# the accessor-method golden set shared by every group: value() takes only
# the implicit this, returns `this.value` (a fieldAccess on this), and its
# fullName is foo.Foo.value:java.lang.String() (:81-136 et al.)
_ACCESSOR = dict(
    methods=[["value", "foo.Foo.value:java.lang.String()"]],
    params=[["value.this", "0:foo.Foo:BY_SHARING"]],
)


def _c(name, code, cite_lines, **rels):
    return dict(name=name, lang="java", wrap=False, code=code,
                cite=f"{_S}:{cite_lines}", **rels)


CASES = [
    # :21-23 — records extend java.lang.Record.
    _c("java-rec-inherits", _COMPACT, "21-23",
       inherits=[["Foo", "java.lang.Record"]]),
    # :25-70 — compact constructor: canonical params + body followed by the
    # implicit `this.value = value`.
    _c("java-rec-compact-ctor", _COMPACT, "25-70",
       methods=[["<init>", "foo.Foo.<init>:void(java.lang.String)"]],
       params=[["<init>.this", "0:foo.Foo:BY_SHARING"],
               ["<init>.value", "1:java.lang.String:BY_SHARING"]],
       ast={("<empty>", 0): ["System.out.println(value)",
                             "this.value = value"],
            ("this.value = value", 0): ["this.value", "value"],
            ("this.value", 0): ["this", "value"]},
       nodetype={("this.value = value", 0, "CALL"): "java.lang.String",
                 ("this.value", 0, "CALL"): "java.lang.String"}),
    # :72-79 — one private field per component.
    _c("java-rec-compact-member", _COMPACT, "72-79",
       members=[["Foo.value", "java.lang.String"]],
       membercode=[["Foo.value", "String value"]]),
    # :81-136 — public accessor returning this.value.
    _c("java-rec-compact-accessor", _COMPACT, "81-136",
       ast={("return this.value", 0): ["this.value"],
            ("this.value", 1): ["this", "value"]},
       **_ACCESSOR),
    # :144-215 — explicit non-canonical ctor + synthesized canonical one.
    _c("java-rec-noncanon-ctors", _NONCANON, "144-215",
       methods=[["<init>", "foo.Foo.<init>:void()"],
                ["<init>", "foo.Foo.<init>:void(java.lang.String)"]],
       params=[["<init>.this", "0:foo.Foo:BY_SHARING"],
               ["<init>.value", "1:java.lang.String:BY_SHARING"]],
       ast={("this.value = \"value\"", 0): ["this.value", "\"value\""],
            ("this.value = value", 0): ["this.value", "value"]},
       nodetype={("this.value = \"value\"", 0, "CALL"): "java.lang.String",
                 ("\"value\"", 0, "LITERAL"): "java.lang.String"}),
    # :217-224
    _c("java-rec-noncanon-member", _NONCANON, "217-224",
       members=[["Foo.value", "java.lang.String"]],
       membercode=[["Foo.value", "String value"]]),
    # :226-275
    _c("java-rec-noncanon-accessor", _NONCANON, "226-275",
       ast={("return this.value", 0): ["this.value"]},
       **_ACCESSOR),
    # :290-331 — explicit canonical ctor: no synthesized duplicate, and no
    # duplicated implicit assignment (the body already assigns).
    _c("java-rec-canon-ctor", _CANON, "290-331",
       methods=[["<init>", "foo.Foo.<init>:void(java.lang.String)"]],
       mcount=[["foo.Foo.<init>:void(java.lang.String)", 1]],
       params=[["<init>.this", "0:foo.Foo:BY_SHARING"],
               ["<init>.value", "1:java.lang.String:BY_SHARING"]],
       ast={("<empty>", 0): ["System.out.println(value)",
                             "this.value = value"],
            ("this.value = value", 0): ["this.value", "value"]}),
    # :333-340
    _c("java-rec-canon-member", _CANON, "333-340",
       members=[["Foo.value", "java.lang.String"]],
       membercode=[["Foo.value", "String value"]]),
    # :342-391
    _c("java-rec-canon-accessor", _CANON, "342-391",
       ast={("return this.value", 0): ["this.value"]},
       **_ACCESSOR),
    # :401-439 — generic record component erases to Object in the
    # canonical ctor signature.
    _c("java-rec-generic-ctor", _GENERIC, "401-439",
       methods=[["<init>", "foo.Foo.<init>:void(java.lang.Object)"]],
       params=[["<init>.this", "0:foo.Foo:BY_SHARING"],
               ["<init>.value", "1:java.lang.Object:BY_SHARING"]],
       ast={("this.value = value", 0): ["this.value", "value"]},
       nodetype={("this.value = value", 0, "CALL"): "java.lang.Object"}),
    # :441-448
    _c("java-rec-generic-member", _GENERIC, "441-448",
       members=[["Foo.value", "java.lang.Object"]]),
    # :450-499 — generic accessor returns the erased Object type.
    _c("java-rec-generic-accessor", _GENERIC, "450-499",
       methods=[["value", "foo.Foo.value:java.lang.Object()"]],
       params=[["value.this", "0:foo.Foo:BY_SHARING"]],
       ast={("return this.value", 0): ["this.value"]}),
    # :509-547 — bodyless record synthesizes the full canonical ctor.
    _c("java-rec-simple-ctor", _SIMPLE, "509-547",
       methods=[["<init>", "foo.Foo.<init>:void(java.lang.String)"]],
       params=[["<init>.this", "0:foo.Foo:BY_SHARING"],
               ["<init>.value", "1:java.lang.String:BY_SHARING"]],
       ast={("this.value = value", 0): ["this.value", "value"]}),
    # :549-556
    _c("java-rec-simple-member", _SIMPLE, "549-556",
       members=[["Foo.value", "java.lang.String"]],
       membercode=[["Foo.value", "String value"]]),
    # :558-607
    _c("java-rec-simple-accessor", _SIMPLE, "558-607",
       ast={("return this.value", 0): ["this.value"]},
       **_ACCESSOR),
]
