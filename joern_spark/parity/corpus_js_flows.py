"""JavaScript dataflow parity corpus — transcribed BY HAND from the
reference's jssrc2cpg dataflow suite (jssrc2cpg/src/test/scala/io/joern/
jssrc2cpg/dataflow/DataflowTests.scala, via DataFlowCodeToCpgSuite).

Exact-set assertions carry the full ``flowToResultPairs`` serializations;
size-only assertions use ``count``/``reachable``/``reachable_pairs``
mirroring ``.size`` on reachableByFlows / reachableBy / dedup.
"""

JSD = ("jssrc2cpg/src/test/scala/io/joern/jssrc2cpg/dataflow/"
       "DataflowTests.scala")

CASES = [
    dict(
        name="js-flow-multiversion", lang="javascript",
        code="""
function flows1(fd, mode) {
  var buff = [];

  var sz = 0;
  if (mode == 1) sz = 20;
  if (mode == 2) sz = 200;
  if (mode == 3) sz = 41;
  if (mode == 5) sz = -5;

  read(fd, buff, sz);
}""",
        flows=[dict(
            name="read_sz",
            source={"identifier": {"name": "sz"}},
            sink={"call": {"code_re": "read.*"}},
            want=[
                [("read(fd, buff, sz)", 11)],
                [("var sz = 0", 5), ("read(fd, buff, sz)", 11)],
                [("sz = 20", 6), ("read(fd, buff, sz)", 11)],
                [("sz = 200", 7), ("read(fd, buff, sz)", 11)],
                [("sz = 41", 8), ("read(fd, buff, sz)", 11)],
                [("sz = -5", 9), ("read(fd, buff, sz)", 11)],
            ],
        )],
        cite=f"{JSD} (multiple versions of the same variable)",
    ),
    dict(
        name="js-flow-call-arg", lang="javascript",
        code="""
function foo(x) {}

function method(y) {
  var a = 10;
  if (a < y) {
    foo(a);
  }
}""",
        flows=[dict(
            name="foo_arg",
            source={"identifier": {"name": "a"}},
            sink={"call_arg": {"code_re": "foo.*"}},
            result_count=6,
        )],
        cite=f"{JSD} (function call argument)",
    ),
    dict(
        name="js-flow-chains", lang="javascript",
        code="""
function flow() {
  var a = 0x37;
  var b = a;
  var c = 0x31;
  var z = b + c;
  z++;
  var p = z;
  var x = z;
}""",
        flows=[dict(
            name="x_from_a",
            source={"identifier": {"name": "a"}},
            sink={"identifier": {"name": "x"}},
            want=[
                [("var a = 0x37", 3), ("var b = a", 4), ("b + c", 6),
                 ("var z = b + c", 6), ("z++", 7), ("var x = z", 9)],
                [("var b = a", 4), ("b + c", 6), ("var z = b + c", 6),
                 ("z++", 7), ("var x = z", 9)],
            ],
        )],
        cite=f"{JSD} (flow chains from x to a)",
    ),
    dict(
        name="js-flow-method-return", lang="javascript",
        code="""
function flow(a) {
  var z = a;
  var b = z;

  return b;
}""",
        flows=[dict(
            name="ret_from_a",
            source={"identifier": {"name": "a"}},
            sink={"ret": {"method": "flow"}},
            want=[[("var z = a", 3), ("var b = z", 4), ("return b", 6)]],
        )],
        cite=f"{JSD} (method return to a)",
    ),
]


CASES += [
    dict(
        name="js-flow-nested-if", lang="javascript",
        code="""
function nested(a) {
  var x = 0;
  var z = 1;
  if(a < 10) {
    if( a < 5) {
      if(a < 2) {
        x = a;
      }
    }
  } else
    x = z;

  return x;
}""",
        flows=[
            dict(name="nested_cond_to_ret",
                 source={"call_arg": {"code": "a < 10", "arg_code": "a"}},
                 sink={"ret": {"method": "nested"}},
                 want=[[("a < 10", 5), ("a < 5", 6), ("a < 2", 7),
                        ("x = a", 8), ("return x", 14)]]),
            dict(name="nested_x_to_ret",
                 source={"identifier": {"name": "x"}},
                 sink={"ret": {"method": "nested"}},
                 want=[
                     [("return x", 14)],
                     [("x = z", 12), ("return x", 14)],
                     [("var x = 0", 3), ("return x", 14)],
                     [("x = a", 8), ("return x", 14)],
                 ]),
        ],
        cite=f"{JSD} (nested if-statements)",
    ),
    dict(
        name="js-flow-arg-chain", lang="javascript",
        code="""
function foo(y) {};

function param(x) {
  var a = x;
  var b = a;
  var z = foo(b);
} """,
        flows=[dict(
            name="foo_arg_chain",
            source={"identifier": {"name": "a"}},
            sink={"call_arg": {"code_re": "foo.*"}},
            result_count=4,
        )],
        cite=f"{JSD} (chain from function argument of foo to a)",
    ),
    dict(
        name="js-flow-foo-to-a", lang="javascript",
        code="""
function param(x) {
  var a = x;
  var b = a;
  var z = foo(b);
}""",
        flows=[dict(
            name="foo_arg1",
            source={"identifier": {"name": "a"}},
            sink={"call_arg": {"code_re": "foo.*", "index": 1}},
            want=[
                [("var a = x", 3), ("var b = a", 4), ("foo(b)", 5)],
                [("var b = a", 4), ("foo(b)", 5)],
            ],
        )],
        cite=f"{JSD} (from function foo to a)",
    ),
    dict(
        name="js-flow-member-access", lang="javascript",
        code="""
var node = {
  'value1' : 1,
  'value2' : 2
};

function test() {
  var x = 10;
  node.value1 = x;
  node.value2 = node.value1;
}""",
        flows=[dict(
            name="member_chain",
            source={"identifier": {"name": "x"}},
            sink={"call": {"code": "node.value2"}},
            want=[
                [("node.value1 = x", 9), ("node.value2 = node.value1", 10)],
                [("var x = 10", 8), ("node.value1 = x", 9),
                 ("node.value2 = node.value1", 10)],
            ],
        )],
        cite=f"{JSD} (member access in expression)",
    ),
    dict(
        name="js-flow-literal-chain", lang="javascript",
        code="""
function flow() {
  var a = 37;
  var b = a;
  var c = 31;
  var z = b + c;
  z++;
  var p = z;
  var x = z;
}""",
        flows=[dict(
            name="lit37_to_x",
            source={"literal": {"code": "37"}},
            sink={"identifier": {"name": "x"}},
            want=[[("var a = 37", 3), ("var b = a", 4), ("b + c", 6),
                   ("var z = b + c", 6), ("z++", 7), ("var x = z", 9)]],
        )],
        cite=f"{JSD} (chain from x to literal 37)",
    ),
    dict(
        name="js-flow-shorthand", lang="javascript",
        code="""
function flow() {
  var a = 37;
  var b = a;
  var z = b;
  z += a;
}""",
        flows=[dict(
            name="shorthand",
            source={"call_arg": {"code": "var a = 37", "index": 2}},
            sink={"call_arg": {"code": "z += a", "index": 1}},
            want=[[("var a = 37", 3), ("var b = a", 4), ("var z = b", 5),
                   ("z += a", 6)]],
        )],
        cite=f"{JSD} (short hand assignment operator)",
    ),
    dict(
        name="js-flow-after-shorthand", lang="javascript",
        code="""
function flow() {
  var a = 37;
  var b = a;
  var z = b;
  z += a;
  var w = z;
}""",
        flows=[dict(
            name="after_shorthand",
            source={"call_arg": {"code": "var a = 37", "index": 1}},
            sink={"identifier": {"name": "w"}},
            want=[[("var a = 37", 3), ("var b = a", 4), ("var z = b", 5),
                   ("z += a", 6), ("var w = z", 7)]],
        )],
        cite=f"{JSD} (after short hand assignment)",
    ),
    dict(
        name="js-flow-array-param", lang="javascript",
        code="""
function main(argc, argv){
  var x = argv[1];
  var y = x;
  var z = y;
  return 0;
}""",
        flows=[dict(
            name="param_to_y",
            source={"param": {"method": "main"}},
            sink={"identifier": {"name": "y"}},
            want=[
                [("main(this, argc, argv)", 2), ("var x = argv[1]", 3),
                 ("var y = x", 4), ("var z = y", 5)],
                [("main(this, argc, argv)", 2), ("var x = argv[1]", 3),
                 ("var y = x", 4)],
            ],
        )],
        cite=f"{JSD} (array method parameter to identifier)",
    ),
    dict(
        name="js-flow-conditional", lang="javascript",
        code="""
function foo(x, y) {
  var z =  x ? f(y) : g(y);
  return;
}""",
        flows=[dict(
            name="cond_y_to_z",
            source={"param": {"name": "y"}},
            sink={"identifier": {"name": "z"}},
            want=[[("foo(this, x, y)", 2), ("f(y)", 3),
                   ("x ? f(y) : g(y)", 3), ("var z =  x ? f(y) : g(y)", 3)]],
        )],
        cite=f"{JSD} (conditional expressions)",
    ),
]


CASES += [
    dict(
        name="js-flow-source-caller", lang="javascript",
        code="""
function bar() {
  var x = source();
  foo(x);
}

function foo(y) {
  sink(y);
}""",
        flows=[dict(
            name="caller_source",
            source={"call": {"code_re": "source.*"}},
            sink={"call_arg": {"code_re": "sink.*"}},
            want=[[("source()", 3), ("var x = source()", 3), ("foo(x)", 4),
                   ("foo(this, y)", 7), ("sink(y)", 8)]],
        )],
        cite=f"{JSD} (source in caller)",
    ),
    dict(
        name="js-flow-source-callee", lang="javascript",
        code="""
function bar() {
  return source();
}

function sink(param) {}

function foo(y) {
  var y = bar();
  sink(y);
}""",
        flows=[
            dict(name="callee_source",
                 source={"call": {"code_re": "source.*"}},
                 sink={"call_arg": {"code_re": "sink.*", "index": 1}},
                 want=[[("source()", 3), ("return source()", 3), ("RET", 2),
                        ("bar()", 9), ("var y = bar()", 9), ("sink(y)", 10)]]),
            dict(name="formal_param_sink",
                 source={"call": {"code_re": "source.*"}},
                 sink={"param": {"method": "sink", "index": 1}},
                 want=[[("source()", 3), ("return source()", 3), ("RET", 2),
                        ("bar()", 9), ("var y = bar()", 9), ("sink(y)", 10),
                        ("sink(this, param)", 6)]]),
        ],
        cite=f"{JSD} (source in callee; formal parameters as sink)",
    ),
    dict(
        name="js-flow-struct-data", lang="javascript",
        code="""
var point = {
  'x' : 0,
  'y' : 0
}

function source() {
  return 2.0;
}

function sink(x) {
  return 3;
}

function main() {
  var k = source();
  point.x = k;
  point.y = 2;
  sink(point.x);
}""",
        flows=[dict(
            name="struct_flow",
            source={"call": {"code_re": "source.*"}},
            sink={"call_arg": {"code_re": "sink.*"}},
            want=[[("source()", 16), ("var k = source()", 16),
                   ("point.x = k", 17), ("sink(point.x)", 19)]],
        )],
        cite=f"{JSD} (struct data)",
    ),
    dict(
        name="js-flow-element-access", lang="javascript",
        code="""
var s = { 'field' : 0 }

function foo(arg) {
  arg.field = source();
  sink(arg.field);
}""",
        flows=[dict(
            name="elem_access",
            source={"call": {"code_re": "source.*"}},
            sink={"call_arg": {"code_re": "sink.*"}},
            want=[[("source()", 5), ("arg.field = source()", 5),
                   ("sink(arg.field)", 6)]],
        )],
        cite=f"{JSD} (object element access)",
    ),
    dict(
        name="js-flow-element-to-source", lang="javascript",
        code="""
function bar() {
  source(a.b);
  sink(a.b);
}""",
        flows=[dict(
            name="elem_to_source",
            source={"call_arg": {"code_re": "source.*"}},
            sink={"call_arg": {"code_re": "sink.*"}},
            want=[[("source(a.b)", 3), ("sink(a.b)", 4)]],
        )],
        cite=f"{JSD} (object element access passed to source)",
    ),
    dict(
        name="js-flow-stmt-to-mret", lang="javascript",
        code="""
function foo(y, x) {
  free(y);
  free(x);
}""",
        flows=[dict(
            name="free_to_ret",
            source={"call_arg": {"code_re": "free.*", "index": 1}},
            sink={"method_return": "foo"},
            want=[[("free(y)", 3), ("RET", 2)],
                  [("free(x)", 4), ("RET", 2)]],
        )],
        cite=f"{JSD} (statements to METHOD_RETURN)",
    ),
    dict(
        name="js-flow-outer-inner-params", lang="javascript",
        code="""
function f(x, y) {
  g(x, y);
}""",
        flows=[dict(
            name="outer_to_inner",
            source={"param": {"method": "f"}},
            sink={"call_arg": {"code_re": "g.*"}},
            want=[[("f(this, x, y)", 2), ("g(x, y)", 3)]],
        )],
        cite=f"{JSD} (outer params to inner params)",
    ),
]


CASES += [
    dict(
        name="js-flow-member", lang="javascript",
        code="""
class Foo {
  x = "foo";
  func() {
    sink(x);
  }
}
""",
        flows=[dict(
            name="member_sink",
            source={"member": {"name": "x"}},
            sink={"call_arg": {"name": "sink", "index": 1}},
            reachable=1,
        )],
        cite=f"{JSD} (non-static member to sink)",
    ),
    dict(
        name="js-flow-static-member", lang="javascript",
        code="""
class Foo {
  static x = "foo";
  func() {
    sink(x);
  }
}
""",
        flows=[dict(
            name="static_member_sink",
            source={"member": {"name": "x"}},
            sink={"call_arg": {"name": "sink", "index": 1}},
            reachable=1,
        )],
        cite=f"{JSD} (static member to sink)",
    ),
    dict(
        name="js-flow-closure-receiver", lang="javascript",
        code="foo.bar( (x,y) => { sink1(x); sink2(y); } )",
        flows=[dict(
            name="receiver_to_closure",
            source={"identifier": {"name": "foo"}},
            sink={"call_arg": {"name": "sink1", "index": 1}},
            reachable=1,
        )],
        cite=f"{JSD} (receiver to closure parameters)",
    ),
    dict(
        name="js-flow-ctor", lang="javascript",
        code="const x = new Foo(y);",
        flows=[dict(
            name="ctor_flow",
            source={"identifier": {"name": "y"}},
            sink={"identifier": {"name": "x"}},
            reachable=1,
        )],
        cite=f"{JSD} (through constructor)",
    ),
    dict(
        name="js-flow-ctor-object", lang="javascript",
        code="const x = new Foo({ z : y } );",
        flows=[dict(
            name="ctor_obj_flow",
            source={"identifier": {"name": "y"}},
            sink={"identifier": {"name": "x"}},
            reachable=1,
        )],
        cite=f"{JSD} (through constructor and object notation)",
    ),
    dict(
        name="js-flow-field-object-notation", lang="javascript",
        code="const x = { p : a.y };",
        flows=[dict(
            name="field_obj_flow",
            source={"field_access": {"field": "y"}},
            sink={"identifier": {"name": "x"}},
            reachable=1,
        )],
        cite=f"{JSD} (field via object notation)",
    ),
    dict(
        name="js-flow-object-to-arg", lang="javascript",
        code="""
const a = { b : 47 } ;
fn(a);
""",
        flows=[dict(
            name="obj_lit_to_arg",
            source={"literal": {"code": "47"}},
            sink={"call": {"name": "fn"}},
            reachable=1,
        )],
        cite=f"{JSD} (inside object notation to call argument)",
    ),
    dict(
        name="js-flow-lambda-const", lang="javascript",
        code="""
const foo = (x, y) => {
  sink(x);
};
foo(1, 2);
""",
        flows=[dict(
            name="lambda_const",
            source={"literal": {"code": "1"}},
            sink={"call": {"name": "sink"}},
            reachable=1,
        )],
        cite=f"{JSD} (method defined as lambda assigned to constant)",
    ),
    dict(
        name="js-flow-irrelevant", lang="javascript",
        code="""
const irrelevant = "irrelevant";
const a = { } ;
sink(a);""",
        flows=[dict(
            name="irrelevant",
            source={"literal": {"code": '"irrelevant"'}},
            sink={"call": {"name": "sink"}},
            reachable=0,
        )],
        cite=f"{JSD} (should not reach irrelevant nodes)",
    ),
]


CASES += [
    dict(
        name="js-flow-for-in", lang="javascript",
        code="""
function foo(x) {
  for(var elem in x) {
    console.log(elem)
  }
}""",
        flows=[
            # "two flows because we find a second one in the lowered
            # for-in loop code"
            dict(name="forin_param",
                 source={"param": {"method": "foo", "index": 1}},
                 sink={"identifier": {"name": "elem"}},
                 reachable_pairs=2),
            dict(name="forin_ident",
                 source={"identifier": {"name": "x"}},
                 sink={"identifier": {"name": "elem"}},
                 reachable_pairs=2),
        ],
        cite=f"{JSD} (for-in loops)",
    ),
    dict(
        name="js-flow-foreach-lambda", lang="javascript",
        code="""
function foo(x) {
  Object.keys(x).forEach(elem => console.log(elem))
}""",
        flows=[
            dict(name="foreach_param",
                 source={"param": {"method": "foo", "index": 1}},
                 sink={"identifier": {"name": "elem"}},
                 reachable_pairs=1),
            dict(name="foreach_ident",
                 source={"identifier": {"name": "x"}},
                 sink={"identifier": {"name": "elem"}},
                 reachable_pairs=1),
        ],
        cite=f"{JSD} (for-each lambda)",
    ),
    dict(
        name="js-flow-parent-scope", lang="javascript",
        code="""
function foo(u) {

  const x = 1;

  function bar() {
     y = x;
     console.log(y);
     v = u;
     console.debug(v);
  }

}""",
        flows=[
            dict(name="scope_ident",
                 source={"identifier": {"name": "x", "line": 4}},
                 sink={"call": {"name": "log"}},
                 reachable=1),
            dict(name="scope_literal",
                 source={"literal": {"code": "1", "line": 4}},
                 sink={"call": {"name": "log"}},
                 reachable_pairs=1),
            dict(name="scope_param",
                 source={"param": {"name": "u", "method": "foo"}},
                 sink={"call": {"name": "debug"}},
                 reachable_pairs=1),
        ],
        cite=f"{JSD} (parent scope to child function scope)",
    ),
    dict(
        name="js-flow-multi-assign", lang="javascript",
        code="""
const middle = source()
const number = 1, sink = middle.fn()
""",
        flows=[dict(
            name="multi_assign",
            source={"call": {"name": "source"}},
            sink={"identifier": {"name": "sink"}},
            result_count=1,
        )],
        cite=f"{JSD} (multiple assignment)",
    ),
    dict(
        name="js-flow-module-capture", lang="javascript",
        code="""
import axios from 'axios';
import { User } from './user';

const API_Endpoint = "https://test-api-service.com";

export const createUser = (user: User) => {
  return axios.post(API_Endpoint + "/user", user);
};
""",
        flows=[
            dict(name="mod_literal",
                 source={"literal": {"code": '"https://test-api-service.com"'}},
                 sink={"call": {"code_re": r"axios\.post\(.*"}},
                 reachable=1),
            dict(name="mod_ident_decl",
                 source={"identifier": {"name": "API_Endpoint", "line": 5}},
                 sink={"call": {"code_re": r"axios\.post\(.*"}},
                 reachable=1),
            dict(name="mod_ident_use",
                 source={"identifier": {"name": "API_Endpoint", "line": 8}},
                 sink={"call": {"code_re": r"axios\.post\(.*"}},
                 reachable_pairs=1),
        ],
        cite=f"{JSD} (module-level literal to captured closure)",
    ),
]
