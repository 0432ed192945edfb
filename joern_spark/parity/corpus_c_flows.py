"""C dataflow parity corpus — transcribed BY HAND from the reference's
golden dataflow suite (c2cpg/src/test/scala/io/joern/c2cpg/dataflow/
DataFlowTests.scala, run through DataFlowCodeToCpgSuite). Each case carries
the fixture source verbatim and the asserted ``reachableByFlows`` result:
either the exact set of ``flowToResultPairs`` lists (``want``) or, where
the reference only asserts ``flows.size``, the path count (``count``).

Pair lists are (code, line) exactly as the reference prints them
(Path.resultPairs, dataflowengineoss/.../language/Path.scala:10-20); line
numbers count from 1 with the leading blank line of the snippet, matching
the stripMargin harness. Source/sink selectors mirror the test's traversal
(cpg.identifier / cpg.method(X).parameter / cpg.call(X).argument(i) / ...).

Skipped (with reasons, for honesty):
* DataFlowTest1/14/44/55's ``parameter.argument`` NoResolve variants where
  they duplicate a transcribed count; 44/66 need METHOD_PARAMETER_OUT flow
  targets (not modeled in the flows extractor).
* DataFlowTest38/42/50(second half)/53's ``reachableBy`` (reachable-set,
  not path) assertions.
* DataFlowTest59 (local.referencingIdentifiers selector), 69 (regex
  methodFullName sink).
"""

CITE = "c2cpg/src/test/scala/io/joern/c2cpg/dataflow/DataFlowTests.scala"


def _f(name, code, flows, cite=CITE):
    return dict(name=name, lang="c", code=code, flows=flows, cite=cite)


CASES = [
    _f("c-flow-02", """
int main(int x) {
  return x;
}""", [
        dict(name="param_to_return",
             source={"param": {"method": "main", "name": "x"}},
             sink={"method_return": "main"},
             want=[[("main(int x)", 2), ("return x;", 3), ("RET", 2)]]),
    ]),
    _f("c-flow-03", """
int main(int x) {
  int k = x + 1;
  int y = k + 2;
  return y + 3;
}""", [
        dict(name="param_to_return",
             source={"param": {"method": "main", "name": "x"}},
             sink={"method_return": "main"},
             want=[[("main(int x)", 2), ("x + 1", 3), ("k = x + 1", 3),
                    ("k + 2", 4), ("y = k + 2", 4), ("y + 3", 5),
                    ("return y + 3;", 5), ("RET", 2)]]),
    ]),
    _f("c-flow-04", """
struct Point {
  int x;
  int y;
};

double source () {
  return 2.0;
}

int sink(int x) {
  return 3;
}

void main() {
  int k = source(2);
  struct Point point;
  point.x = k;
  point.y = 2;
  sink(point.x);
}""", [
        dict(name="struct_flow",
             source={"method_return": "source"},
             sink={"param": {"method": "sink", "name": "x"}},
             want=[[("RET", 7), ("source(2)", 16), ("k = source(2)", 16),
                    ("point.x = k", 18), ("sink(point.x)", 20),
                    ("sink(int x)", 11)]]),
    ]),
    _f("c-flow-05", """
int source() {
  return 2;
}

int sink(int x) {
  return 3;
}

void main() {
  int k = source();
  foo(k);
}

void foo(int par) {
  sink(par);
}""", [
        dict(name="interprocedural",
             source={"method_return": "source"},
             sink={"param": {"method": "sink", "name": "x"}},
             want=[[("RET", 2), ("source()", 11), ("k = source()", 11),
                    ("foo(k)", 12), ("foo(int par)", 15), ("sink(par)", 16),
                    ("sink(int x)", 6)]]),
    ]),
    _f("c-flow-06", """
struct Point {
  int x;
  int y;
};

struct Point source () {
  struct Point point;
  return point;
}

int sink(int x) {
  return 0;
}

void main() {
  struct Point point = source(2);
  sink(point.x);
}""", [
        dict(name="tainted_struct",
             source={"method_return": "source"},
             sink={"param": {"method": "sink", "name": "x"}},
             want=[[("RET", 7), ("source(2)", 17), ("point = source(2)", 17),
                    ("sink(point.x)", 18), ("sink(int x)", 12)]]),
    ]),
    _f("c-flow-07", """
typedef struct {
  int len;
  int* buf;
} container;

int source();
void sink(container* cont);

void foo(container* c, int idx) {
  c->buf[idx] = source();
  c->buf = 0;
  sink(c);
}""", [
        dict(name="overtaint_excluded",
             source={"method_return": "source"},
             sink={"param": {"method": "sink"}},
             count=0),
    ]),
    _f("c-flow-08", """
int source();
void sink(int* cont);

void foo(int** c, int idx) {
  c[1][2] = source();
  c[idx][2] = 0;
  sink(c[1]);
}""", [
        dict(name="exclusion_no_kill",
             source={"method_return": "source"},
             sink={"param": {"method": "sink"}},
             want=[[("RET", 2), ("source()", 6), ("c[1][2] = source()", 6),
                    ("sink(c[1])", 8), ("sink(int* cont)", 3)]]),
    ]),
    _f("c-flow-09", """
typedef struct {int field;} S;
int source();
void sink(int i);

void foo(S* arg) {
  arg->field = source();
  sink((*arg).field);
}""", [
        dict(name="arrow_vs_stardot",
             source={"method_return": "source"},
             sink={"param": {"method": "sink"}},
             want=[[("RET", 3), ("source()", 7), ("arg->field = source()", 7),
                    ("sink((*arg).field)", 8), ("sink(int i)", 4)]]),
    ]),
    _f("c-flow-10", """
int source();
void sink(int i);

void foo(int* arg) {
  arg[0] = source();
  sink(*arg);
}""", [
        dict(name="deref_vs_array",
             source={"method_return": "source"},
             sink={"param": {"method": "sink"}},
             want=[[("RET", 2), ("source()", 6), ("arg[0] = source()", 6),
                    ("sink(*arg)", 7), ("sink(int i)", 3)]]),
        # DataFlowTest35 (same shape): sink at the deref expression itself
        dict(name="deref_sink",
             source={"method_return": "source"},
             sink={"call": {"code": "*arg"}},
             count=1),
    ]),
    _f("c-flow-11", """
#include <stdio.h>
#include <stdlib.h>
#include <sys/types.h>
#include <unistd.h>

void main() {
  int a = getpid();
  int b = 888;
  if(a == 666) {
    a = a * 666;
    b = 999;
  } else {
    a = a * 777;
  }
  return a;
}""", [
        dict(name="path_unfolding",
             source={"call": {"name": "getpid"}},
             sink={"ret": {}},
             want=[[("getpid()", 8), ("a = getpid()", 8), ("a == 666", 10),
                    ("a * 666", 11), ("a = a * 666", 11),
                    ("return a;", 16)]]),
    ]),
    _f("c-flow-12", """
int source();
void sink(int arg);
void nop(int x) {return;};

void foo(int* c, int idx) {
  c[2] = source();
  nop(c[idx]);
  sink(c[1]);
}""", [
        dict(name="nop_no_widen",
             source={"method_return": "source"},
             sink={"param": {"method": "sink"}},
             count=0),
    ]),
    _f("c-flow-13", """
void flows1(FILE *fd, int mode) {
  char buff[40];
  int sz = 0;
  if (mode == 1) sz = 20;
  if (mode == 2) sz = 200;
  if (mode == 3) sz = 41;
  if (mode == 5) sz = -5;
  read(fd, buff, sz);
}""", [
        dict(name="multi_version_var",
             source={"identifier": {"name": "sz"}},
             sink={"call": {"name": "read"}},
             want=[
                 [("sz = 20", 5), ("read(fd, buff, sz)", 9)],
                 [("sz = 0", 4), ("read(fd, buff, sz)", 9)],
                 [("sz = 200", 6), ("read(fd, buff, sz)", 9)],
                 [("read(fd, buff, sz)", 9)],
                 [("sz = -5", 8), ("read(fd, buff, sz)", 9)],
                 [("sz = 41", 7), ("read(fd, buff, sz)", 9)],
             ]),
    ]),
    _f("c-flow-15", """
int method(int y){
  int a = 10;
  if (a < y){
    foo(a);
  }
}""", [
        dict(name="call_arg_flow",
             source={"identifier": {"name": "a"}},
             sink={"call_arg": {"name": "foo"}},
             want=[
                 [("a = 10", 3), ("a < y", 4), ("foo(a)", 5)],
                 [("a < y", 4), ("foo(a)", 5)],
                 [("foo(a)", 5)],
             ]),
    ]),
    _f("c-flow-16", """
void flow(void) {
  int a = 0x37;
  int b=a;
  int c=0x31;
  int z = b + c;
  z++;
  int* p = &z;
  int x = z;
}""", [
        dict(name="chain_x_to_a",
             source={"identifier": {"name": "a"}},
             sink={"identifier": {"name": "x"}},
             want=[
                 [("a = 0x37", 3), ("b=a", 4), ("b + c", 6), ("z = b + c", 6),
                  ("z++", 7), ("x = z", 9)],
                 [("b=a", 4), ("b + c", 6), ("z = b + c", 6), ("z++", 7),
                  ("x = z", 9)],
             ]),
        # DataFlowTest23 (same fixture): literal source
        dict(name="chain_x_to_lit",
             source={"literal": {"code": "0x37"}},
             sink={"identifier": {"name": "x"}},
             want=[
                 [("a = 0x37", 3), ("b=a", 4), ("b + c", 6), ("z = b + c", 6),
                  ("z++", 7), ("x = z", 9)],
             ]),
    ]),
    _f("c-flow-17", """
int flow(int a) {
  int z = a;
  int b = z;
  return b;
}""", [
        dict(name="ident_to_return",
             source={"identifier": {"name": "a"}},
             sink={"ret": {"method": "flow"}},
             want=[[("z = a", 3), ("b = z", 4), ("return b;", 5)]]),
    ]),
    _f("c-flow-18", """
int nested(int a) {
  int x;
  int z = 0x37;
  if(a < 10) {
    if( a < 5) {
      if(a < 2) {
        x = a;
      }
    }
  } else x = z;
  return x;
}""", [
        dict(name="nested_if_a",
             source={"call_arg": {"code": "a < 10", "arg_code": "a"}},
             sink={"ret": {"method": "nested"}},
             want=[[("a < 10", 5), ("a < 5", 6), ("a < 2", 7), ("x = a", 8),
                    ("return x;", 12)]]),
        # DataFlowTest19 (same fixture): identifier x source
        dict(name="nested_if_x",
             source={"identifier": {"name": "x"}},
             sink={"ret": {"method": "nested"}},
             want=[
                 [("x = a", 8), ("return x;", 12)],
                 [("x = z", 11), ("return x;", 12)],
                 [("return x;", 12)],
             ]),
    ]),
    _f("c-flow-20", """
void param(int x) {
  int a = x;
  int b = a;
  int z = foo(b);
}""", [
        dict(name="arg_chain",
             source={"identifier": {"name": "a"}},
             sink={"call_arg": {"name": "foo"}},
             want=[
                 [("a = x", 3), ("b = a", 4), ("foo(b)", 5)],
                 [("b = a", 4), ("foo(b)", 5)],
             ]),
    ]),
    _f("c-flow-22", """
struct node {
  int value1;
  int value2;
};

void test(void) {
  int x = 10;
  struct node n;
  n.value1 = x;
  n.value2 = n.value1;
}""", [
        dict(name="member_access",
             source={"identifier": {"name": "x"}},
             sink={"call": {"code": "n.value2"}},
             want=[
                 [("x = 10", 8), ("n.value1 = x", 10),
                  ("n.value2 = n.value1", 11)],
                 [("n.value1 = x", 10), ("n.value2 = n.value1", 11)],
             ]),
    ]),
    _f("c-flow-24", """
void flow(void) {
  int a = 0x37;
  int b = a;
  int z = b;
  z+=a;
}""", [
        dict(name="shorthand_assign",
             source={"call_arg": {"code": "a = 0x37", "index": 2}},
             sink={"call_arg": {"code": "z+=a", "index": 1}},
             want=[[("a = 0x37", 3), ("b = a", 4), ("z = b", 5),
                    ("z+=a", 6)]]),
    ]),
    _f("c-flow-25", """
void flow(void) {
  int a = 0x37;
  int b = a;
  int z = b;
  z+=a;
  int w = z;
}""", [
        dict(name="after_shorthand",
             source={"call_arg": {"code": "a = 0x37", "index": 1}},
             sink={"identifier": {"name": "w"}},
             want=[[("a = 0x37", 3), ("b = a", 4), ("z = b", 5), ("z+=a", 6),
                    ("w = z", 7)]]),
    ]),
    _f("c-flow-26", """
int main(int argc, char** argv) {
  int x = argv[1];
  int y = x;
  int z = y;
  return 0;
}""", [
        dict(name="array_param",
             source={"param": {}},
             sink={"identifier": {"name": "y"}},
             want=[
                 [("main(int argc, char** argv)", 2), ("x = argv[1]", 3),
                  ("y = x", 4), ("z = y", 5)],
                 [("main(int argc, char** argv)", 2), ("x = argv[1]", 3),
                  ("y = x", 4)],
             ]),
    ]),
    _f("c-flow-27", """
void foo(bool x, void* y) {
  void* z =  x ? f(y) : g(y);
  return;
}""", [
        dict(name="conditional_expr",
             source={"param": {"method": "foo", "name": "y"}},
             sink={"identifier": {"name": "z"}},
             count=1),
    ]),
    _f("c-flow-28", """
int bar() {
 int x = source();
 foo(x);
}

void foo(int y) {
  sink(y);
}""", [
        dict(name="source_in_caller",
             source={"call": {"name": "source"}},
             sink={"call_arg": {"name": "sink", "index": 1}},
             want=[[("source()", 3), ("x = source()", 3), ("foo(x)", 4),
                    ("foo(int y)", 7), ("sink(y)", 8)]]),
    ]),
    _f("c-flow-29", """
int bar() {
  return source();
}

void foo(int y) {
  int y = bar();
  sink(y);
}""", [
        dict(name="source_in_callee",
             source={"call": {"name": "source"}},
             sink={"call_arg": {"name": "sink", "index": 1}},
             want=[[("source()", 3), ("return source();", 3), ("RET", 2),
                    ("bar()", 7), ("y = bar()", 7), ("sink(y)", 8)]]),
        dict(name="formal_param_sink",
             source={"call": {"name": "source"}},
             sink={"param": {"method": "sink"}},
             want=[[("source()", 3), ("return source();", 3), ("RET", 2),
                    ("bar()", 7), ("y = bar()", 7), ("sink(y)", 8),
                    ("sink(p1)", -1)]]),
    ]),
    _f("c-flow-33", """
int source();
void sink(int* cont);

void foo(int** c, int idx) {
  c[1][2] = source();
  c[idx][2] = 0;
  sink(c[1]);
}""", [
        dict(name="overtaint_count",
             source={"method_return": "source"},
             sink={"param": {"method": "sink"}},
             count=1),
    ]),
    _f("c-flow-36", """
int foo() {
  source(&a->c);
  sink(a->b);
}""", [
        dict(name="access_path_differs",
             source={"call_arg": {"name": "source"}},
             sink={"param": {"method": "sink"}},
             count=0),
    ]),
    _f("c-flow-37", """
int bar() {
  source(&a->b);
  sink(a->b);
}""", [
        dict(name="address_to_source",
             source={"call_arg": {"name": "source"}},
             sink={"param": {"method": "sink"}},
             want=[[("source(&a->b)", 3), ("sink(a->b)", 4),
                    ("sink(p1)", -1)]]),
    ]),
    _f("c-flow-40", """
int foo() {
  int y = 1;
  y = something_else;
  y = 10;
}""", [
        dict(name="lit_to_exit",
             source={"literal": {"code": "1"}},
             sink={"method_return": "foo"},
             count=1),
    ]),
    _f("c-flow-41", """
int foo() {
  char * y = malloc(10);
  free(y);
  y = 10;
}""", [
        dict(name="freed_not_to_exit",
             source={"call_arg": {"name": "free", "index": 1}},
             sink={"method_return": "foo"},
             count=0),
    ]),
    _f("c-flow-42", """
int foo(int b) {
  b = source();
  b = 10;
  sink(b);
}""", [
        dict(name="reassign_blocks",
             source={"call": {"name": "source"}},
             sink={"param": {"method": "sink"}},
             count=0),
    ]),
    _f("c-flow-45", """
int bar(int z) {
  int x = 10;
  int y = x + source()
  return y;
}

int foo() {
  int y = bar(x);
  sink(y);
}""", [
        dict(name="sibling_callee",
             source={"call": {"name": "source"}},
             sink={"call_arg": {"name": "sink", "index": 1}},
             count=1),
    ]),
    _f("c-flow-46", """
void foo() {
  int x = source();
  sink(x);
}""", [
        dict(name="via_assignment",
             source={"call": {"name": "source"}},
             sink={"call": {"name": "sink"}},
             want=[[("source()", 3), ("x = source()", 3), ("sink(x)", 4)]]),
    ]),
    _f("c-flow-47", """
int sink(int arg){  return arg; };
int source(){ return 0; };

void foo() {
  sink(source());
}""", [
        dict(name="call_in_call",
             source={"call": {"name": "source"}},
             sink={"call": {"name": "sink"}},
             want=[[("source()", 6), ("sink(int arg)", 2), ("return arg;", 2),
                    ("RET", 2), ("sink(source())", 6)]]),
    ]),
    _f("c-flow-49", """
void foo(int x) {
  x = source();
  sink(x);
}""", [
        dict(name="global_assign",
             source={"call": {"name": "source"}},
             sink={"call": {"name": "sink"}},
             want=[[("source()", 3), ("x = source()", 3), ("sink(x)", 4)]]),
    ]),
    _f("c-flow-50", """
void foo() {
  int x = source();
  x = y;
  sink(x);
}""", [
        dict(name="blocked_by_assign",
             source={"call": {"name": "source"}},
             sink={"call": {"name": "sink"}},
             count=0),
        dict(name="assign_target_flows",
             source={"call_arg": {"code": "x = y", "index": 1}},
             sink={"call": {"name": "sink"}},
             want=[[("x = y", 4), ("sink(x)", 5)]]),
    ]),
    _f("c-flow-51", """
void foo() {
  x.y = source();
  sink(x.y);
}""", [
        dict(name="field_access",
             source={"call": {"name": "source"}},
             sink={"call": {"name": "sink"}},
             want=[[("source()", 3), ("x.y = source()", 3),
                    ("sink(x.y)", 4)]]),
    ]),
    _f("c-flow-52", """
void foo() {
  x->y = source();
  sink(x->y);
}""", [
        dict(name="indirect_field_access",
             source={"call": {"name": "source"}},
             sink={"call": {"name": "sink"}},
             want=[[("source()", 3), ("x->y = source()", 3),
                    ("sink(x->y)", 4)]]),
    ]),
    _f("c-flow-54", """
void foo() {
  int data;
  fscanf(stdin, "%d", &data);
  int result = data + 1;
  printf("%d\\n", result);
}""", [
        dict(name="via_fscanf",
             source={"call_arg": {"name": "fscanf"}},
             sink={"identifier": {"name": "result"}},
             want=[
                 [("fscanf(stdin, \"%d\", &data)", 4), ("data + 1", 5),
                  ("result = data + 1", 5), ("printf(\"%d\\n\", result)", 6)],
                 [("fscanf(stdin, \"%d\", &data)", 4), ("data + 1", 5),
                  ("result = data + 1", 5)],
             ]),
    ]),
    _f("c-flow-56", """
int test() {
  char inputBuffer[0x100] = "";
  int buffer[10] = {0};
  int data = 1;
  fgets(inputBuffer, 0x100, stdin);
  data = atoi(inputBuffer);
  buffer[data] = 1;
  strncpy(buffer, "hello", data);
  return 0;
}""", [
        dict(name="to_strncpy",
             source={"call_arg": {"name": "fgets", "index": 1}},
             sink={"call_arg": {"name": "strncpy", "index": 3}},
             want=[[("fgets(inputBuffer, 0x100, stdin)", 6),
                    ("atoi(inputBuffer)", 7), ("data = atoi(inputBuffer)", 7),
                    ("strncpy(buffer, \"hello\", data)", 9)]]),
        dict(name="to_index_access",
             source={"call_arg": {"name": "fgets", "index": 1}},
             sink={"call_arg": {"name": "<operator>.indirectIndexAccess",
                                "index": 2}},
             want=[[("fgets(inputBuffer, 0x100, stdin)", 6),
                    ("atoi(inputBuffer)", 7), ("data = atoi(inputBuffer)", 7),
                    ("buffer[data] = 1", 8)]]),
    ]),
    _f("c-flow-57", """
void abc() {
  int a;
  a = foo();
  a = bar(0x80);
  sink(a);
}""", [
        dict(name="killed_assign",
             source={"assign_target_of_call": {"name": "foo"}},
             sink={"param": {"method": "sink"}},
             count=0),
    ]),
    _f("c-flow-58", """
void abc(int a) {
  a = foo();
  a = bar(0x80);
  sink(a);
}""", [
        dict(name="killed_param",
             source={"param": {"method": "abc"}},
             sink={"param": {"method": "sink"}},
             count=0),
    ]),
    _f("c-flow-60", """
void outer(char* ptr){
  taint1(ptr);
  inner(ptr);
  return;
}

void inner(char * ptr) {
  // taint2(ptr);
  ptr = malloc(0x80);
  sink(ptr);
}""", [
        dict(name="callee_reassign",
             source={"call_arg": {"name": "taint1"}},
             sink={"call_arg": {"name": "sink"}},
             count=0),
    ]),
    _f("c-flow-61", """
void reassignThenFree(char * ptr) {
  ptr = malloc(0x80);
  free(ptr);
  return;
}

void reassign(char * ptr) {
  ptr = malloc(0x80);
  return;
}

// This flow from `free` to `free` should be returned
int case0() {
  char * data = malloc(0x100);
  free(data);
  free(data);
  return 0;
}""", [
        dict(name="double_free",
             source={"call_arg": {"name": "free", "index": 1}},
             sink={"call_arg": {"name": "free", "index": 1}},
             min_elements=2,
             want=[[("free(data)", 16), ("free(data)", 17)]]),
    ]),
    _f("c-flow-62", """
void reassignThenFree(char * ptr) {
  ptr = malloc(0x80);
  free(ptr);
  return;
}

void reassign(char * ptr) {
  ptr = malloc(0x80);
  return;
}

// This flow should NOT be returned
int case1() {
  char * data = malloc(0x100);
  free(data);
  data = malloc(0x80);
  free(data);
  return 0;
}""", [
        dict(name="no_double_free",
             source={"call_arg": {"name": "free", "index": 1}},
             sink={"call_arg": {"name": "free", "index": 1}},
             min_elements=2,
             count=0),
    ]),
    _f("c-flow-64", """
void reassign(char * ptr) {
  ptr = malloc(0x80);
  return;
}

// This flow should NOT be returned
int case3() {
  char * data = malloc(0x100);
  free(data);
  reassign(data);
  free(data);
  return 0;
}""", [
        dict(name="byvalue_double_free",
             source={"call_arg": {"name": "free", "index": 1}},
             sink={"call_arg": {"name": "free", "index": 1}},
             min_elements=2,
             count=1),
    ]),
    _f("c-flow-70", """
int source() {
  return 42;
}

void main() {
  sink(source());
}""", [
        dict(name="arg_is_call",
             source={"literal": {"code": "42"}},
             sink={"call_arg": {"name": "sink"}},
             count=1),
    ]),
    _f("c-flow-71", """
void abc() {
  char *a;
  fgets(a, 10, stdin);
  a = "something";
  a[5] = "\\0";
  system(a);
}""", [
        dict(name="fgets_killed",
             source={"call_arg": {"name": "fgets", "index": 1}},
             sink={"call_arg": {"name": "system", "index": 1}},
             count=0),
    ]),
]

CASES += [
    _f("c-flow-21", """
void param(int x) {
  int a = x;
  int b = a;
  int z = foo(b);
}""", [
        dict(name="ident_a_to_foo_arg",
             source={"identifier": {"name": "a"}},
             sink={"call_arg": {"name": "foo", "index": 1}},
             want=[[("a = x", 3), ("b = a", 4), ("foo(b)", 5)],
                   [("b = a", 4), ("foo(b)", 5)]]),
    ]),
    _f("c-flow-31", """
struct Point {
  int x;
  int y;
};

struct Point source () {
  struct Point point;
  return point;
}

int sink(int x) {
  return 0;
}

void main() {
  struct Point point = source(2);
  sink(point.x);
}""", [
        dict(name="tainted_struct",
             source={"method_return": "source"},
             sink={"param": {"method": "sink", "name": "x"}},
             want=[[("RET", 7), ("source(2)", 17),
                    ("point = source(2)", 17), ("sink(point.x)", 18),
                    ("sink(int x)", 12)]]),
    ]),
    _f("c-flow-32", """
typedef struct {
  int len;
  int* buf;
} container;

int source();
void sink(container* cont);

void foo(container* c, int idx) {
  c->buf[idx] = source();
  c->buf = 0;
  sink(c);
}""", [
        # the overwrite `c->buf = 0` kills the taint (:896-901)
        dict(name="killed_by_overwrite",
             source={"method_return": "source"},
             sink={"param": {"method": "sink"}},
             count=0),
    ]),
    _f("c-flow-34", """
typedef struct {int field;} S;
int source();
void sink(int i);

void foo(S* arg) {
  arg->field = source();
  sink((*arg).field);
}
""", [
        # arrow vs star-dot spell the same access path (:923-941)
        dict(name="arrow_vs_stardot",
             source={"method_return": "source"},
             sink={"param": {"method": "sink"}},
             count=1),
    ]),
    _f("c-flow-72", """
struct struct_length {
 unsigned int *plen;
};
struct wraping_struct {
  struct struct_length *s_len;
};
void sink(unsigned int *plen4) {
  *plen4 = 1000;
}
void level3(unsigned int *plen3) {
  sink(plen3);
}
void level2(unsigned int *plen2) {
  level3(plen2);
}
void level1(struct struct_length s_len) {
  level2(s_len->plen);
}
void source(struct wraping_struct w_struct) {
  level1(w_struct->s_len);
}
""", [
        dict(name="four_level_chain",
             source={"param": {"method": "source"}},
             sink={"call_arg": {"name": "sink", "index": 1}},
             want=[[("source(struct wraping_struct w_struct)", 20),
                    ("level1(w_struct->s_len)", 21),
                    ("level1(struct struct_length s_len)", 17),
                    ("level2(s_len->plen)", 18),
                    ("level2(unsigned int *plen2)", 14),
                    ("level3(plen2)", 15),
                    ("level3(unsigned int *plen3)", 11),
                    ("sink(plen3)", 12)]]),
    ]),
]

# DataFlowTest73-78: compound assignment operators (%=, ^=, |=, &=, <<=,
# >>=) taint both the expression value and the target's next use.
for _i, _op in ((73, "%="), (74, "^="), (75, "|="), (76, "&="),
                (77, "<<="), (78, ">>=")):
    CASES.append(_f(f"c-flow-{_i}", f"""
int main(void) {{
 int x = 5;
 call1(x{_op}2);
 call2(x);
}}
""", [
        dict(name="taints_outer",
             source={"literal": {"code": "2"}},
             sink={"call": {"name": "call1"}},
             want=[[(f"x{_op}2", 4), (f"call1(x{_op}2)", 4)]]),
        dict(name="taints_next_use",
             source={"literal": {"code": "2"}},
             sink={"call": {"name": "call2"}},
             want=[[(f"x{_op}2", 4), ("call2(x)", 5)]]),
    ]))

CASES += [
    _f("c-flow-79", """
int main(void) {
 int x = 5;
 int y = 2;
 int z = x % y;
 call1(z);
}
""", [
        dict(name="first_arg_not_taints_second",
             source={"literal": {"code": "5"}},
             sink={"identifier": {"name": "y", "line": 5}},
             count=0, want=[]),
        dict(name="second_arg_not_taints_first",
             source={"literal": {"code": "2"}},
             sink={"identifier": {"name": "x", "line": 5}},
             count=0, want=[]),
        dict(name="args_taint_return",
             source={"literal": {}},
             sink={"call_arg": {"name": "call1"}},
             want=[[("x = 5", 3), ("x % y", 5), ("z = x % y", 5),
                    ("call1(z)", 6)],
                   [("y = 2", 4), ("x % y", 5), ("z = x % y", 5),
                    ("call1(z)", 6)]]),
    ]),
    _f("c-flow-80", """
int main(void) {
 int x = 10;
 int y = 20;
 int z[] = {x, y, 30};
 call1(z);
}
""", [
        dict(name="array_elems_taint_value",
             source={"literal": {}},
             sink={"call_arg": {"name": "call1"}},
             want=[[("x = 10", 3), ("{x, y, 30}", 5),
                    ("z[] = {x, y, 30}", 5), ("call1(z)", 6)],
                   [("y = 20", 4), ("{x, y, 30}", 5),
                    ("z[] = {x, y, 30}", 5), ("call1(z)", 6)],
                   [("{x, y, 30}", 5), ("z[] = {x, y, 30}", 5),
                    ("call1(z)", 6)]]),
    ]),
    _f("c-flow-81", """int a = 1;
int b = 2;
int c = 3;

void foo() {
  bar(a, b, c);
}
""", [
        dict(name="top_level_a",
             source={"literal": {"code": "1"}},
             sink={"call_arg": {"name": "bar", "index": 1}},
             want=[[("a = 1", 1), ("bar(a, b, c)", 6)]]),
        dict(name="top_level_b",
             source={"literal": {"code": "2"}},
             sink={"call_arg": {"name": "bar", "index": 2}},
             want=[[("b = 2", 2), ("bar(a, b, c)", 6)]]),
        dict(name="top_level_c",
             source={"literal": {"code": "3"}},
             sink={"call_arg": {"name": "bar", "index": 3}},
             want=[[("c = 3", 3), ("bar(a, b, c)", 6)]]),
    ]),
]
