"""Differential test against the REFERENCE CODE ITSELF.

The reference's v2-migration chain is pure Node (no puppeteer).  This tool
type-strips the relevant TypeScript (tags.ts, v2migration/engine/index.ts,
v2migration/tabRus.ts) into a runnable CommonJS file in /tmp, executes it
with the system node against the committed 9,126-entry Tabasaran v1 input,
and structurally diffs the result against our Python engine's output.

The stripped JS is GENERATED at run time from /root/reference and never
committed — only this transformer and the diff live in the repo.  Type
stripping uses exact-anchor replacements for every typed signature (the
reference is a fixed snapshot, so anchors are stable) plus a few generic
rules; the script asserts every anchor matched.

Usage: python tools/ref_differential.py   → prints DIFFERENTIAL: ... verdict
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = os.environ.get("SPARK_GRAFT_REFERENCE", "/root/reference")

# (exact TS text, JS replacement) — signatures/declarations whose annotations
# a generic regex cannot safely strip (object-literal return types etc.)
_EXACT = [
    ("export function readDictionaryFromJSONFile(filePath: string): DictionaryV1 {",
     "function readDictionaryFromJSONFile(filePath) {"),
    ("export function extractTagsFromDefinition(definition: string): { tags: string[]; def: string } {",
     "function extractTagsFromDefinition(definition) {"),
    ("const tags: string[] = [];", "const tags = [];"),
    ("export function createDefinitionObject(definition: string): { value: string; tags?: string[] } {",
     "function createDefinitionObject(definition) {"),
    ("export function splitToExampleObject(definition: string): Example | undefined {",
     "function splitToExampleObject(definition) {"),
    ("""export function convertDictionaryV1ToV2(
  dict: DictionaryV1,
  customMapper: (oldExpression: ExpressionV1) => {
    expression: ExpressionV2;
    mergeWithExisting: boolean;
  },
  meta: {
    authors?: string;
    publicationYear?: string;
    providedBy?: string;
    providedByURL?: string;
    processedBy?: string;
  } = {},
): DictionaryV2 {""",
     "function convertDictionaryV1ToV2(dict, customMapper, meta = {}) {"),
    ("const parsedSpellings = new Set<string>();", "const parsedSpellings = new Set();"),
    ("const expressions: ExpressionV2[] = []; //dict.dictionary.map(customMapper);",
     "const expressions = [];"),
    # tabRus.ts / rusLezHajiyev.ts
    ("function hasOneMoreClosingParenthesis(str: string) {",
     "function hasOneMoreClosingParenthesis(str) {"),
    ("function mergeTagsWithDefinitions(arr: string[]): string[] {",
     "function mergeTagsWithDefinitions(arr) {"),
    ("const result: string[] = [];", "const result = [];"),
    ("let tempPrefix: string | undefined = undefined;", "let tempPrefix = undefined;"),
    ("function removeAllNumeralsFromDefinitionStart(definition: string) {",
     "function removeAllNumeralsFromDefinitionStart(definition) {"),
    ("""function extractInflections(
  definition: string,
  tempInflections: any[],
  details: ExpressionDetails,
  spelling: string,
): string {""",
     "function extractInflections(definition, tempInflections, details, spelling) {"),
    ("""const customMapper = (
  entry: ExpressionV1,
): { expression: ExpressionV2; mergeWithExisting: boolean } => {""",
     "const customMapper = (entry) => {"),
    ("const details: ExpressionDetails = {", "const details = {"),
    ("const examples = [] as Example[];", "const examples = [];"),
]

_IMPORT_RE = re.compile(r"^import[\s\S]*?;\s*$", re.M)


def _strip(src: str, anchors: list[tuple[str, str]]) -> str:
    for ts, js in anchors:
        if ts in src:
            src = src.replace(ts, js)
    src = _IMPORT_RE.sub("", src)
    src = src.replace("export const ", "const ").replace("export function ", "function ")
    # `expr as Type` casts (always a simple identifier/array type here)
    src = re.sub(r"\s+as\s+[A-Z][\w$]*(\[\])?", "", src)
    return src


_MAPPER_FILES = {
    "tab_rus": "tabRus.ts",
    "lez_rus_babakhanov": "lezRusBabakhanov.ts",
    "rus_lez_hajiyev": "rusLezHajiyev.ts",
}


def build_js(tmpdir: str, mapper: str) -> str:
    with open(os.path.join(REF, "tags.ts"), encoding="utf-8") as f:
        tags_src = f.read().replace("export default {", "const tags = {")
    with open(os.path.join(REF, "v2migration", "engine", "index.ts"), encoding="utf-8") as f:
        engine_src = f.read()
    with open(
        os.path.join(REF, "v2migration", _MAPPER_FILES[mapper]), encoding="utf-8"
    ) as f:
        map_src = f.read()

    engine_js = _strip(engine_src, _EXACT)
    # cut the mapper's file-writing tail (everything from the input-path const)
    cut = map_src.index("const filePath = path.join(")
    map_js = _strip(map_src[:cut], _EXACT)
    for leftover in (": ExpressionV1", ": ExpressionV2", ": Example", ": string"):
        assert leftover not in map_js, f"unstripped annotation in {mapper}: {leftover}"

    harness = """
const dict = JSON.parse(fs.readFileSync(process.argv[2], 'utf8'));
const v2 = convertDictionaryV1ToV2(dict, customMapper, {});
fs.writeFileSync(process.argv[3], JSON.stringify(v2.expressions));
"""
    out = os.path.join(tmpdir, f"ref_{mapper}.cjs")
    with open(out, "w", encoding="utf-8") as f:
        f.write("const fs = require('fs');\nconst path = require('path');\n")
        f.write(tags_src + "\n")
        f.write(engine_js + "\n")
        f.write(map_js + "\n")
        f.write(harness)
    return out


def canon(o):
    """Order-insensitive-dict, order-sensitive-list canonical form."""
    if isinstance(o, dict):
        return {k: canon(v) for k, v in sorted(o.items()) if v is not None}
    if isinstance(o, list):
        return [canon(x) for x in o]
    return o


_INPUTS = {
    # (mapper, input json) — tabRus on its own committed input; the Word-HTML
    # mappers on the other committed v1 (same shape; the differential is
    # reference-code-vs-our-code on identical input, not a replay of a
    # specific historical run)
    "tab_rus": "tab_rus_dict_hanmagomedov_shalbuzov.json",
    "lez_rus_babakhanov": "lezgi_rus_dict_talibov_hajiyev.json",
    "rus_lez_hajiyev": "lezgi_rus_dict_talibov_hajiyev.json",
}


def run_one(tmpdir: str, mapper: str) -> tuple[bool, int]:
    from html_parser_spark.engine.core import convert_dictionary_v1_to_v2
    from html_parser_spark.engine.mappers import MAPPERS

    js = build_js(tmpdir, mapper)
    inp = os.path.join(REF, "v2migration", "input", _INPUTS[mapper])
    out = os.path.join(tmpdir, f"ref_out_{mapper}.json")
    r = subprocess.run(["node", js, inp, out], capture_output=True, text=True, timeout=300)
    if r.returncode != 0:
        print(f"NODE FAILED ({mapper}):\n" + r.stderr[-1500:])
        return False, 0
    with open(out, encoding="utf-8") as f:
        ref_expressions = json.load(f)
    with open(inp, encoding="utf-8") as f:
        v1 = json.load(f)
    mine = convert_dictionary_v1_to_v2(v1["dictionary"], MAPPERS[mapper])
    a, b = canon(ref_expressions), canon(mine)
    if a == b:
        print(f"DIFFERENTIAL {mapper}: EXACT MATCH — {len(a)} expressions")
        return True, len(a)
    print(f"DIFFERENTIAL {mapper}: MISMATCH — ref {len(a)} vs mine {len(b)}")
    shown = 0
    for i, (x, y) in enumerate(zip(a, b)):
        if x != y and shown < 2:
            print(f"-- diff at expression {i}:")
            print("REF :", json.dumps(x, ensure_ascii=False)[:350])
            print("MINE:", json.dumps(y, ensure_ascii=False)[:350])
            shown += 1
    return False, len(a)


# --- export-stage differential (M12 parallel corpus) -----------------------

_CORPUS_EXACT = [
    ("""function mapExamples(
  examples: Example[],
  lezKey: 'src' | 'trl',
  rusKey: 'src' | 'trl',
): ExampleResult[] {""",
     "function mapExamples(examples, lezKey, rusKey) {"),
    ("""function getExamplesFromDictionary(
  dict: DictionaryV2_1,
  lez: 'src' | 'trl',
  rus: 'src' | 'trl',
): ExampleResult[] {""",
     "function getExamplesFromDictionary(dict, lez, rus) {"),
    ("const result: ExampleResult[] = [];", "const result = [];"),
    ("const examples: ExampleResult[] = mapExamples(expressionDetails.examples, lez, rus);",
     "const examples = mapExamples(expressionDetails.examples, lez, rus);"),
    ("const csvData: ExampleResult[] = [", "const csvData = ["),
    ("""const dictionaries: { lezRus: DictionaryV2_1; rusLez: DictionaryV2_1 } = {
  lezRus: lezgiRusBabakhanov as DictionaryV2_1,
  rusLez: rusLezgiHajyiev as DictionaryV2_1,
};""",
     """const dictionaries = {
  lezRus: JSON.parse(fs.readFileSync(process.argv[2], 'utf8')),
  rusLez: JSON.parse(fs.readFileSync(process.argv[3], 'utf8')),
};"""),
    ("type ExampleResult = { lez: string; rus: string };", ""),
    ("""export function writeCsvFile(filePath: string, data: string) {
  fs.writeFileSync(filePath, data);
}""",
     """function writeCsvFile(filePath, data) {
  fs.writeFileSync(process.env.REFDIFF_OUT + '/' + path.basename(filePath), data);
}"""),
]


def build_corpus_js(tmpdir: str) -> str:
    with open(
        os.path.join(REF, "v2migration", "postProcessing",
                     "99_pp_examplesToParallelCorpus.ts"),
        encoding="utf-8",
    ) as f:
        body = _strip(f.read(), _CORPUS_EXACT)
    out = os.path.join(tmpdir, "ref_corpus.cjs")
    with open(out, "w", encoding="utf-8") as f:
        f.write("const fs = require('fs');\nconst path = require('path');\n")
        f.write(body + "\n")
    return out


def run_corpus(tmpdir: str, final_v21: dict) -> bool:
    """Execute 99_pp_examplesToParallelCorpus on the chain outputs and diff
    the CSV against our M12 implementation (same lezRus+rusLez inputs)."""
    from html_parser_spark.engine.exports import examples_to_parallel_corpus

    env_out = os.path.join(tmpdir, "corpusout")
    os.makedirs(env_out, exist_ok=True)
    env = dict(os.environ, REFDIFF_OUT=env_out)

    final_v21 = _null_filtered(final_v21)
    paths = []
    for mapper in ("lez_rus_babakhanov", "rus_lez_hajiyev"):
        p = os.path.join(tmpdir, f"corpus_in_{mapper}.json")
        with open(p, "w", encoding="utf-8") as f:
            json.dump({"expressions": final_v21[mapper]}, f, ensure_ascii=False)
        paths.append(p)
    js = build_corpus_js(tmpdir)
    r = subprocess.run(["node", js, *paths], capture_output=True, text=True,
                       timeout=300, env=env)
    if r.returncode != 0:
        print("NODE corpus FAILED:\n" + r.stderr[-1200:])
        return False
    with open(os.path.join(env_out, "lez_rus_corpus.csv"), encoding="utf-8") as f:
        ref_csv = f.read()
    mine = examples_to_parallel_corpus(final_v21["lez_rus_babakhanov"], "src", "trl")
    mine += examples_to_parallel_corpus(final_v21["rus_lez_hajiyev"], "trl", "src")
    my_csv = "\n".join(f"{p['lez']};{p['rus']}" for p in mine)
    if ref_csv == my_csv:
        print(f"DIFFERENTIAL corpus(M12): EXACT MATCH — {len(mine)} pairs, "
              "byte-identical CSV")
        return True
    print("DIFFERENTIAL corpus(M12): MISMATCH")
    ra, rb = ref_csv.split("\n"), my_csv.split("\n")
    print(f"ref {len(ra)} lines vs mine {len(rb)}")
    for i, (x, y) in enumerate(zip(ra, rb)):
        if x != y:
            print(f"-- first diff line {i}:\nREF : {x[:200]}\nMINE: {y[:200]}")
            break
    return False


def _null_filtered(finals: dict) -> dict:
    """M9's undefined-push bug leaves null examples that would crash the
    reference export scripts too (undefined.src); filter them on BOTH sides
    so the differentials compare export logic, not the crash."""
    import copy

    out = {}
    for m, exprs in finals.items():
        cp = copy.deepcopy(exprs)
        for e in cp:
            for det in e["details"]:
                if det.get("examples"):
                    det["examples"] = [x for x in det["examples"] if x]
                for dd in det["definitionDetails"]:
                    if dd.get("examples"):
                        dd["examples"] = [x for x in dd["examples"] if x]
        out[m] = cp
    return out


# --- export-stage differential (M13 training pairs, CSV path) --------------

_JSONL_EXACT = [
    ("function isTag(tag: string): boolean {", "function isTag(tag) {"),
    ("function cleanFromTags(str: string): string | undefined {",
     "function cleanFromTags(str) {"),
    ("const cleanStrArray: string[] = [];", "const cleanStrArray = [];"),
    ("""type TrainingExample = {
  messages: [
    // { role: 'system'; content: string },
    { role: 'user'; content: string },
    { role: 'assistant'; content: string },
  ];
};""", ""),
    ("function randomItem(items: any[]) {", "function randomItem(items) {"),
    ("const createTrainingExampleJsonl = (lezgiText: string, rusText: string): TrainingExample => ({",
     "const createTrainingExampleJsonl = (lezgiText, rusText) => ({"),
    ("""const dictionaries: { dictionary: DictionaryV2_1; outFileName: string; isSrcLezgi: boolean }[] = [
  {
    dictionary: rusLezgiHajyiev as DictionaryV2_1,
    outFileName: 'rus_lezgi_dict_hajiyev_v2_1',
    isSrcLezgi: false,
  },
  {
    dictionary: lezRuzBabakhanov as DictionaryV2_1,
    outFileName: 'lezgi_rus_dict_babakhanov_v2_1',
    isSrcLezgi: true,
  },
];""",
     """const dictionaries = [
  {
    dictionary: JSON.parse(fs.readFileSync(process.argv[3], 'utf8')),
    outFileName: 'rus_lezgi_dict_hajiyev_v2_1',
    isSrcLezgi: false,
  },
  {
    dictionary: JSON.parse(fs.readFileSync(process.argv[2], 'utf8')),
    outFileName: 'lezgi_rus_dict_babakhanov_v2_1',
    isSrcLezgi: true,
  },
];"""),
    ("""function dictExamplesToTrainingExamples(
  isSrcLezgi: boolean,
  examples?: Example[],
): [string, string][] {""",
     "function dictExamplesToTrainingExamples(isSrcLezgi, examples) {"),
    ("function splitSemicolons(srcText: string, trlText: string) {",
     "function splitSemicolons(srcText, trlText) {"),
    ("function removeNameDescription(definitionStr: string) {",
     "function removeNameDescription(definitionStr) {"),
    ("function isSeeAlso(str: string, isRussian: boolean): boolean {",
     "function isSeeAlso(str, isRussian) {"),
    ("function removeEnumerations(str: string): string {",
     "function removeEnumerations(str) {"),
    ("function splitCommaSeparatedLists(str: string, wordCountDeviationThreshold = 2): string[] {",
     "function splitCommaSeparatedLists(str, wordCountDeviationThreshold = 2) {"),
    ("const createTrainingExample = (lezgiText: string, rusText: string): [string, string][] => {",
     "const createTrainingExample = (lezgiText, rusText) => {"),
    ("""  const removedNameDescriptions: [string, string][] = splittedSemicolons.map(
    ([lezgiText, rusText]) => {""",
     """  const removedNameDescriptions = splittedSemicolons.map(
    ([lezgiText, rusText]) => {"""),
    ("const filteredSeeAlsoDefinitions: [string, string][] = [];",
     "const filteredSeeAlsoDefinitions = [];"),
    ("""  const removedListingNumbers: [string, string][] = filteredSeeAlsoDefinitions.map(([rus, lez]) => [
    removeEnumerations(rus),
    removeEnumerations(lez),
  ]);""",
     """  const removedListingNumbers = filteredSeeAlsoDefinitions.map(([rus, lez]) => [
    removeEnumerations(rus),
    removeEnumerations(lez),
  ]);"""),
    ("    .filter(([rus, lez]) => rus !== undefined && lez !== undefined) as [string, string][];",
     "    .filter(([rus, lez]) => rus !== undefined && lez !== undefined);"),
    ("const combinations: [string, string][] = [];", "const combinations = [];"),
    ("""  const cleanedUp: [string, string][] = splittedCommaSeparatedLists
    .map(([rus, lez]) => [toLowerCaseLezgi(rus), toLowerCaseLezgi(lez)])
    .filter(
      ([rus, lez]) =>
        rus !== undefined && lez !== undefined && rus.trim() !== '' && lez.trim() !== '',
    ) as [string, string][];""",
     """  const cleanedUp = splittedCommaSeparatedLists
    .map(([rus, lez]) => [toLowerCaseLezgi(rus), toLowerCaseLezgi(lez)])
    .filter(
      ([rus, lez]) =>
        rus !== undefined && lez !== undefined && rus.trim() !== '' && lez.trim() !== '',
    );"""),
    ("const trainingExamplesAll: [string, string][] = [];",
     "const trainingExamplesAll = [];"),
    ("const trainingExamples: [string, string][] = [];",
     "const trainingExamples = [];"),
    ("const definitionStrings: string[] = [];", "const definitionStrings = [];"),
    ("""    const trainingExamplesJson: TrainingExample[] = trainingExamples.map((exp) =>
      createTrainingExampleJsonl(exp[0], exp[1]),
    );""",
     """    const trainingExamplesJson = trainingExamples.map((exp) =>
      createTrainingExampleJsonl(exp[0], exp[1]),
    );"""),
    ("""  const trainingExamplesAllJson: TrainingExample[] = trainingExamplesAll.map((exp) =>
    createTrainingExampleJsonl(exp[0], exp[1]),
  );""",
     """  const trainingExamplesAllJson = trainingExamplesAll.map((exp) =>
    createTrainingExampleJsonl(exp[0], exp[1]),
  );"""),
]

_TOLOWER_EXACT = [
    ("""export function toLowerCaseLezgi(
  lezgiString: string,
  options: { capitalize: boolean } = { capitalize: false },
) {""",
     "function toLowerCaseLezgi(lezgiString, options = { capitalize: false }) {"),
]


def build_jsonl_js(tmpdir: str) -> str:
    with open(os.path.join(REF, "tags.ts"), encoding="utf-8") as f:
        tags_src = f.read().replace("export default {", "const tags = {")
    with open(os.path.join(REF, "utils.ts"), encoding="utf-8") as f:
        utils_src = f.read()
    # only toLowerCaseLezgi is needed from utils; cut the rest via anchors
    start = utils_src.index("export function toLowerCaseLezgi")
    tolower_js = _strip(utils_src[start:], _TOLOWER_EXACT)
    with open(
        os.path.join(REF, "v2migration", "postProcessing", "99_v2DictToJsonL.ts"),
        encoding="utf-8",
    ) as f:
        body = _strip(f.read(), _JSONL_EXACT)
    preamble = """
function writeCsvOut(name, data) {
  fs.writeFileSync(process.env.REFDIFF_OUT + '/' + name, data);
}
fs.writeFileSync = (function(orig) {
  return function(p, data) { orig.call(fs, process.env.REFDIFF_OUT + '/' + path.basename(p), data); };
})(fs.writeFileSync.bind(fs));
"""
    out = os.path.join(tmpdir, "ref_jsonl.cjs")
    with open(out, "w", encoding="utf-8") as f:
        f.write("const fs = require('fs');\nconst path = require('path');\n")
        f.write(tags_src + "\n")
        f.write(tolower_js + "\n")
        f.write(preamble + "\n")
        f.write(body + "\n")
    return out


def run_training(tmpdir: str, final_v21: dict) -> bool:
    from html_parser_spark.engine.exports import expressions_to_training_pairs

    env_out = os.path.join(tmpdir, "trainout")
    os.makedirs(env_out, exist_ok=True)
    env = dict(os.environ, REFDIFF_OUT=env_out)
    paths = []
    for mapper in ("lez_rus_babakhanov", "rus_lez_hajiyev"):
        p = os.path.join(tmpdir, f"train_in_{mapper}.json")
        with open(p, "w", encoding="utf-8") as f:
            json.dump({"expressions": final_v21[mapper]}, f, ensure_ascii=False)
        paths.append(p)
    js = build_jsonl_js(tmpdir)
    r = subprocess.run(["node", js, *paths], capture_output=True, text=True,
                       timeout=600, env=env)
    if r.returncode != 0:
        print("NODE training FAILED:\n" + r.stderr[-1200:])
        return False
    ok = True
    for mapper, fname, is_src_lezgi in (
        ("rus_lez_hajiyev", "rus_lezgi_dict_hajiyev_v2_1.csv", False),
        ("lez_rus_babakhanov", "lezgi_rus_dict_babakhanov_v2_1.csv", True),
    ):
        with open(os.path.join(env_out, fname), encoding="utf-8") as f:
            ref_csv = f.read()
        mine = expressions_to_training_pairs(final_v21[mapper], is_src_lezgi)
        my_csv = "\n".join(f"{r};{l}" for r, l in mine)
        if ref_csv == my_csv:
            print(f"DIFFERENTIAL training(M13) {mapper}: EXACT MATCH — "
                  f"{len(mine)} pairs, byte-identical CSV")
        else:
            ok = False
            print(f"DIFFERENTIAL training(M13) {mapper}: MISMATCH")
            ra, rb = ref_csv.split("\n"), my_csv.split("\n")
            print(f"ref {len(ra)} lines vs mine {len(rb)}")
            for i, (x, y) in enumerate(zip(ra, rb)):
                if x != y:
                    print(f"-- first diff line {i}:\nREF : {x[:200]}\nMINE: {y[:200]}")
                    break
    return ok


# --- M15 quality-check differential ----------------------------------------

_QUALITY_EXACT = [
    ("""export function writeCsvFile(filePath: string, data: string) {
  fs.writeFileSync(filePath, data);
}""",
     """function writeCsvFile(filePath, data) {
  fs.writeFileSync(process.env.REFDIFF_OUT + '/' + path.basename(filePath), data);
}"""),
    ("""const dictionaries: DictionaryV2_1[] = [
  lezgiRusBabakhanov as DictionaryV2_1,
  rusLezgiHajyiev as DictionaryV2_1,
  tabRusHanShal as DictionaryV2_1,
];""",
     """const dictionaries = [
  JSON.parse(fs.readFileSync(process.argv[2], 'utf8')),
  JSON.parse(fs.readFileSync(process.argv[3], 'utf8')),
  JSON.parse(fs.readFileSync(process.argv[4], 'utf8')),
];"""),
    ("  private static readonly csvSeparator = ';';", "  static csvSeparator = ';';"),
    ("  spellingWithRandomChars: boolean;", "  spellingWithRandomChars;"),
    ("  spellingWithRandomCharsIgnoreSpaces: boolean;",
     "  spellingWithRandomCharsIgnoreSpaces;"),
    ("  inflectionsWithRandomChars?: string;", "  inflectionsWithRandomChars;"),
    ("  tagInExpressionDetails: boolean = false;", "  tagInExpressionDetails = false;"),
    ("  private _definitionsContainingExpressions: string[] = [];",
     "  _definitionsContainingExpressions = [];"),
    ("  private _definitionsStartingWithParenthesis: string[] = [];",
     "  _definitionsStartingWithParenthesis = [];"),
    ("  private _definitionsStartingWithRandomChars: string[] = [];",
     "  _definitionsStartingWithRandomChars = [];"),
    ("  private _examplesContainingExpressions: string[] = [];",
     "  _examplesContainingExpressions = [];"),
    ("  private _definitionsStartingWithTags: string[] = [];",
     "  _definitionsStartingWithTags = [];"),
    ("  private _stringsEndingWithCurlyBraces: string[] = [];",
     "  _stringsEndingWithCurlyBraces = [];"),
    ("  private _examplesStoredAsDefinitions: string[] = [];",
     "  _examplesStoredAsDefinitions = [];"),
    ("  isEmpty(): boolean {", "  isEmpty() {"),
    ("  toCsv(firstColumn?: string): string {", "  toCsv(firstColumn) {"),
    ("  static getHeader(firstColumn?: string): string {",
     "  static getHeader(firstColumn) {"),
    ("const analysisResults: Record<string, ExpressionAnalysisResult> = {};",
     "const analysisResults = {};"),
]


def build_quality_js(tmpdir: str) -> str:
    with open(os.path.join(REF, "v2migration", "qualityCheck.ts"), encoding="utf-8") as f:
        body = _strip(f.read(), _QUALITY_EXACT)
    out = os.path.join(tmpdir, "ref_quality.cjs")
    with open(out, "w", encoding="utf-8") as f:
        f.write("const fs = require('fs');\nconst path = require('path');\n")
        f.write(body + "\n")
    return out


def _py_quality_csv(expressions: list[dict]) -> str:
    """Serialize our analyze_dictionary output exactly like
    ExpressionAnalysisResult.toCsv (JS join semantics: false/true, undefined
    → '', arrays joined '|')."""
    from html_parser_spark.engine.quality import analyze_dictionary

    _stats, reports = analyze_dictionary(expressions)

    def js(v):
        if v is None:
            return ""
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, list):
            return "|".join(v)
        return str(v)

    header = ("spelling;spellingWithRandomChars;spellingWithRandomCharsIgnoreSpaces;"
              "inflectionsWithRandomChars;definitionsContainingExpressions;"
              "definitionsStartingWithParenthesis;definitionsStartingWithRandomChars;"
              "examplesContainingExpressions;definitionsStartingWithTags;"
              "stringsEndingWithCurlyBraces;examplesStoredAsDefinitions;"
              "tagInExpressionDetails")
    rows = [header]
    for spelling, ar in reports:
        rows.append(";".join([
            spelling,
            js(ar["spellingWithRandomChars"]),
            js(ar["spellingWithRandomCharsIgnoreSpaces"]),
            js(ar["inflectionsWithRandomChars"]),
            js(ar["definitionsContainingExpressions"]),
            js(ar["definitionsStartingWithParenthesis"]),
            js(ar["definitionsStartingWithRandomChars"]),
            js(ar["examplesContainingExpressions"]),
            js(ar["definitionsStartingWithTags"]),
            js(ar["stringsEndingWithCurlyBraces"]),
            js(ar["examplesStoredAsDefinitions"]),
            js(ar["tagInExpressionDetails"]),
        ]))
    return "\n".join(rows)


def run_quality(tmpdir: str, final_v21: dict) -> bool:
    env_out = os.path.join(tmpdir, "qualout")
    os.makedirs(env_out, exist_ok=True)
    env = dict(os.environ, REFDIFF_OUT=env_out)
    order = ["lez_rus_babakhanov", "rus_lez_hajiyev", "tab_rus"]
    paths = []
    for i, mapper in enumerate(order):
        p = os.path.join(tmpdir, f"qual_in_{i}.json")
        with open(p, "w", encoding="utf-8") as f:
            json.dump({"name": f"d{i}", "expressions": final_v21[mapper]}, f,
                      ensure_ascii=False)
        paths.append(p)
    js = build_quality_js(tmpdir)
    r = subprocess.run(["node", js, *paths], capture_output=True, text=True,
                       timeout=300, env=env)
    if r.returncode != 0:
        print("NODE quality FAILED:\n" + r.stderr[-1200:])
        return False
    ok = True
    for i, mapper in enumerate(order):
        with open(os.path.join(env_out, f"d{i}_undefined_analysis.csv"),
                  encoding="utf-8") as f:
            ref_csv = f.read()
        my_csv = _py_quality_csv(final_v21[mapper])
        if ref_csv == my_csv:
            n = len(my_csv.split("\n")) - 1
            print(f"DIFFERENTIAL quality(M15) {mapper}: EXACT MATCH — {n} report rows")
        else:
            ok = False
            print(f"DIFFERENTIAL quality(M15) {mapper}: MISMATCH")
            ra, rb = ref_csv.split("\n"), my_csv.split("\n")
            print(f"ref {len(ra)} lines vs mine {len(rb)}")
            for j, (x, y) in enumerate(zip(ra, rb)):
                if x != y:
                    print(f"-- first diff line {j}:\nREF : {x[:220]}\nMINE: {y[:220]}")
                    break
    return ok


# --- post-processing chain differential (01 → 02 → 03) --------------------

_PP_EXACT = [
    # 01_tagsMappingAndGrouping.ts
    ("function candidatesToTags(tagCandidates: string[], spelling?: string) {",
     "function candidatesToTags(tagCandidates, spelling) {"),
    ("function processMissedTags(defValue: string) {",
     "function processMissedTags(defValue) {"),
    ("function tagMapper(tag: string): string {", "function tagMapper(tag) {"),
    ("function mapTags(tags: string[] | undefined, tagDefinition: string): string[] {",
     "function mapTags(tags, tagDefinition) {"),
    ("function checkIsDefinitionTag(value: string): boolean {",
     "function checkIsDefinitionTag(value) {"),
    ("function moveCommonTags(defDetails: DefinitionDetails) {",
     "function moveCommonTags(defDetails) {"),
    ("const processedTags: string[] = [];", "const processedTags = [];"),
    ("let tagDefinition: string | undefined = undefined;",
     "let tagDefinition = undefined;"),
    ("let tagDefinitionDefIdx: number | undefined = undefined;",
     "let tagDefinitionDefIdx = undefined;"),
    ("const CHOSEN_DICTIONARY = dictionaries[2];",
     "const CHOSEN_DICTIONARY = dictionaries[parseInt(process.argv[5])];"),
    # 03_splitSpelling.ts
    ("function splitParenthesesSpelling(spelling: string): string[] {",
     "function splitParenthesesSpelling(spelling) {"),
    ("const splittedResults: string[][] = [];", "const splittedResults = [];"),
    ("const newDictionary: DictionaryV2_1 = {", "const newDictionary = {"),
]

_DICT_BLOCK_RE = re.compile(
    r"const dictionaries:[\s\S]*?\n\]\s*;", re.M
)
_DICT_BLOCK_JS_RE = re.compile(
    r"const dictionaries = \[[\s\S]*?\n\]\s*;", re.M
)


def _strip_pp(src: str, keep_dictionaries: bool) -> str:
    src = _strip(src, _EXACT + _PP_EXACT)
    if keep_dictionaries:
        # type annotation on the array already stripped piecemeal? no — the
        # annotated declaration spans `const dictionaries: {...}[] = [`;
        # normalize it to plain JS
        src = re.sub(
            r"const dictionaries:\s*\{[\s\S]*?\}\[\]\s*=\s*\[",
            "const dictionaries = [",
            src,
            count=1,
        )
        src = re.sub(
            r"const dictionaries:\s*DictionaryV2_1\[\]\s*=\s*\[",
            "const dictionaries = [",
            src,
            count=1,
        )
    else:
        src = _DICT_BLOCK_RE.sub("", src)
    return src


def build_pp_js(tmpdir: str, script: str) -> str:
    """Assemble one of the 01/02/03 scripts with its dependencies."""
    with open(os.path.join(REF, "tags.ts"), encoding="utf-8") as f:
        tags_src = f.read().replace("export default {", "const tags = {")
    with open(os.path.join(REF, "v2migration", "engine", "index.ts"), encoding="utf-8") as f:
        engine_js = _strip(f.read(), _EXACT)
    with open(
        os.path.join(REF, "v2migration", "postProcessing", script), encoding="utf-8"
    ) as f:
        body = _strip_pp(f.read(), keep_dictionaries=True)

    preamble = """
const lezRuzBabakhanov = JSON.parse(fs.readFileSync(process.argv[2], 'utf8'));
const rusLezgiHajyiev = JSON.parse(fs.readFileSync(process.argv[3], 'utf8'));
const tabRusHanShal = JSON.parse(fs.readFileSync(process.argv[4], 'utf8'));
function writeJSONFile(p, data) {
  const out = process.env.REFDIFF_OUT + '/' + path.basename(p);
  fs.writeFileSync(out, JSON.stringify(data));
}
function writeCsvFile(p, data) {}
"""
    out = os.path.join(tmpdir, f"ref_{script}.cjs")
    with open(out, "w", encoding="utf-8") as f:
        f.write("const fs = require('fs');\nconst path = require('path');\n")
        f.write(tags_src + "\n")
        f.write(engine_js + "\n")
        f.write(preamble + "\n")
        f.write(body + "\n")
    return out


# --- flipper differential (M11 counters) -----------------------------------
# flipper.ts's sink is commented out and its grouping mutates aliased details
# arrays ({...exp} shallow copy at :100), so a byte-diff target doesn't exist;
# the four console.log counters plus the grouped-key count (key set is
# unaffected by the aliasing) ARE well-defined — compare those.

_FLIPPER_EXACT = [
    (
        "const dictionary = (v2dict as DictionaryV2).expressions as ExpressionV2[];",
        "const v2dict = JSON.parse(fs.readFileSync(process.argv[2], 'utf8'));\n"
        "const dictionary = v2dict.expressions;",
    ),
    ("const flippedExpression: ExpressionV2 = {", "const flippedExpression = {"),
    (
        "const singleWordFilter = (def: string): boolean =>",
        "const singleWordFilter = (def) =>",
    ),
    (
        "const groupedExpressionsList: ExpressionV2[] = Object.values(groupedByExpressionSpelling);",
        "const groupedExpressionsList = Object.values(groupedByExpressionSpelling);",
    ),
]


def build_flipper_js(tmpdir: str) -> str:
    with open(os.path.join(REF, "tags.ts"), encoding="utf-8") as f:
        tags_src = f.read().replace("export default {", "const tags = {")
    with open(os.path.join(REF, "v2migration", "engine", "index.ts"), encoding="utf-8") as f:
        engine_js = _strip(f.read(), _EXACT)
    with open(os.path.join(REF, "v2flipper", "flipper.ts"), encoding="utf-8") as f:
        body = _strip(f.read(), _EXACT + _FLIPPER_EXACT)
    live = "\n".join(
        ln for ln in body.splitlines() if not ln.lstrip().startswith("//")
    )
    for leftover in (": ExpressionV2", ": DictionaryV2", ": boolean"):
        assert leftover not in live, f"unstripped annotation in flipper: {leftover}"
    out = os.path.join(tmpdir, "ref_flipper.cjs")
    with open(out, "w", encoding="utf-8") as f:
        f.write("const fs = require('fs');\nconst path = require('path');\n")
        f.write("function writeJSONFile(p, data) {}\n")
        f.write(tags_src + "\n")
        f.write(engine_js + "\n")
        f.write(body + "\n")
        # harness-added counter over a reference-defined variable: the key
        # set of the grouping is well-defined even with the aliasing bug
        f.write(
            "console.log('Amount of grouped flipped expressions:', "
            "groupedExpressionsList.length);\n"
        )
    return out


def run_flipper(tmpdir: str, clean_bab: list) -> bool:
    """Counter differential: reference flipper.ts (executed under node) vs
    engine.flipper.flip_expressions on the SAME stage-01 babakhanov V2."""
    from html_parser_spark.engine.flipper import flip_expressions

    inp = os.path.join(tmpdir, "flipper_in.json")
    with open(inp, "w", encoding="utf-8") as f:
        json.dump({"name": "lez_rus_babakhanov", "expressions": clean_bab}, f,
                  ensure_ascii=False)
    js = build_flipper_js(tmpdir)
    r = subprocess.run(["node", js, inp], capture_output=True, text=True, timeout=300)
    if r.returncode != 0:
        print("NODE flipper FAILED:\n" + r.stderr[-1200:])
        return False
    ref = {}
    for line in r.stdout.splitlines():
        m = re.match(r"(.+):\s+(\d+)$", line.strip())
        if m:
            ref[m.group(1).strip()] = int(m.group(2))
    grouped, counters = flip_expressions(clean_bab, include_single_words=False)
    pairs = [
        ("Amount of tags that are parsed as definitions [TO BE FIXED]",
         counters["tag_as_definition"]),
        ("Amount of single word definitions", counters["single_word_definitions"]),
        ("Amount of comma separated definitions",
         counters["comma_separated_definitions"]),
        ("Amount of splitted comma separated definitions",
         counters["split_comma_separated_definitions"]),
        ("Amount of grouped flipped expressions", len(grouped)),
    ]
    ok = True
    for key, mine in pairs:
        got = ref.get(key)
        status = "==" if got == mine else "MISMATCH"
        if got != mine:
            ok = False
        print(f"DIFFERENTIAL flipper counter [{key}]: ref {got} vs mine {mine} {status}")
    if ok:
        print(f"DIFFERENTIAL flipper(M11): EXACT MATCH — all {len(pairs)} counters")
    return ok


def run_pp_chain(tmpdir: str, mapper_outputs: dict):
    """Execute 01 (per dictionary), 02, 03 with the reference flow and diff
    the final V2.1 expressions against our Python chain."""
    import copy

    from html_parser_spark.engine import postprocess as pp

    env_out = os.path.join(tmpdir, "ppout")
    os.makedirs(env_out, exist_ok=True)
    env = dict(os.environ, REFDIFF_OUT=env_out)

    # wrap mapper outputs as DictionaryV2 json files with the file names 01/03 expect
    names = {
        "lez_rus_babakhanov": "lezgi_rus_dict_babakhanov_v2.json",
        "rus_lez_hajiyev": "rus_lezgi_dict_hajiyev_v2.json",
        "tab_rus": "tab_rus_dict_hanmagomedov_shalbuzov_v2.json",
    }
    stage_in = {}
    for mapper, exprs in mapper_outputs.items():
        p = os.path.join(tmpdir, names[mapper])
        with open(p, "w", encoding="utf-8") as f:
            json.dump({"name": mapper, "expressions": exprs}, f, ensure_ascii=False)
        stage_in[mapper] = p

    argv_files = [
        stage_in["lez_rus_babakhanov"],
        stage_in["rus_lez_hajiyev"],
        stage_in["tab_rus"],
    ]

    # --- 01 per dictionary (index 0=bab, 1=haj, 2=tab)
    js01 = build_pp_js(tmpdir, "01_tagsMappingAndGrouping.ts")
    clean = {}
    for idx, mapper in ((0, "lez_rus_babakhanov"), (1, "rus_lez_hajiyev"), (2, "tab_rus")):
        r = subprocess.run(["node", js01, *argv_files, str(idx)],
                           capture_output=True, text=True, timeout=300, env=env)
        if r.returncode != 0:
            print(f"NODE 01 FAILED ({mapper}):\n" + r.stderr[-1200:])
            return False, {}, None
        with open(os.path.join(env_out, names[mapper]), encoding="utf-8") as f:
            clean[mapper] = json.load(f)["expressions"]

    # --- 02 (haj + tab only, per the reference)
    for mapper in ("rus_lez_hajiyev", "tab_rus"):
        with open(stage_in[mapper], "w", encoding="utf-8") as f:
            json.dump({"name": mapper, "expressions": clean[mapper]}, f, ensure_ascii=False)
    js02 = build_pp_js(tmpdir, "02_examplesExtraction.ts")
    r = subprocess.run(["node", js02, *argv_files], capture_output=True, text=True,
                       timeout=300, env=env)
    if r.returncode != 0:
        print("NODE 02 FAILED:\n" + r.stderr[-1200:])
        return False, {}, None
    extracted = dict(clean)
    for mapper in ("rus_lez_hajiyev", "tab_rus"):
        with open(os.path.join(env_out, names[mapper]), encoding="utf-8") as f:
            extracted[mapper] = json.load(f)["expressions"]

    # --- 03 (bab from cleanTags, haj+tab from extractedExamples)
    for mapper in names:
        with open(stage_in[mapper], "w", encoding="utf-8") as f:
            json.dump({"name": mapper, "expressions": extracted[mapper]}, f,
                      ensure_ascii=False)
    js03 = build_pp_js(tmpdir, "03_splitSpelling.ts")
    r = subprocess.run(["node", js03, *argv_files], capture_output=True, text=True,
                       timeout=300, env=env)
    if r.returncode != 0:
        print("NODE 03 FAILED:\n" + r.stderr[-1200:])
        return False, {}, None
    final_names = {
        "lez_rus_babakhanov": "lezgi_rus_dict_babakhanov_v2_1.json",
        "rus_lez_hajiyev": "rus_lezgi_dict_hajiyev_v2_1.json",
        "tab_rus": "tab_rus_dict_hanmagomedov_shalbuzov_v2_1.json",
    }
    ok = True
    ref_finals = {}
    for mapper, exprs in mapper_outputs.items():
        with open(os.path.join(env_out, final_names[mapper]), encoding="utf-8") as f:
            ref_final = json.load(f)["expressions"]
        ref_finals[mapper] = ref_final
        mine = copy.deepcopy(exprs)
        for e in mine:
            pp.standardize_expression_tags(e)
            if mapper != "lez_rus_babakhanov":
                pp.extract_examples(e)
        mine = [pp.split_spelling(e, pp.SPELLING_SPLITTERS[mapper]) for e in mine]
        a, b = canon(ref_final), canon(mine)
        if a == b:
            print(f"DIFFERENTIAL chain(01-03) {mapper}: EXACT MATCH — {len(a)} expressions")
        else:
            ok = False
            print(f"DIFFERENTIAL chain(01-03) {mapper}: MISMATCH — ref {len(a)} vs mine {len(b)}")
            shown = 0
            for i, (x, y) in enumerate(zip(a, b)):
                if x != y and shown < 2:
                    print(f"-- diff at expression {i}:")
                    print("REF :", json.dumps(x, ensure_ascii=False)[:350])
                    print("MINE:", json.dumps(y, ensure_ascii=False)[:350])
                    shown += 1
    return ok, ref_finals, clean["lez_rus_babakhanov"]


def main():
    tmpdir = tempfile.mkdtemp(prefix="refdiff_")
    ok = True
    mapper_outputs = {}
    for mapper in _INPUTS:
        good, _n = run_one(tmpdir, mapper)
        ok = ok and good
        with open(os.path.join(tmpdir, f"ref_out_{mapper}.json"), encoding="utf-8") as f:
            mapper_outputs[mapper] = json.load(f)
    chain_ok, ref_finals, clean_bab = run_pp_chain(tmpdir, mapper_outputs)
    ok = chain_ok and ok
    if clean_bab is not None:
        ok = run_flipper(tmpdir, clean_bab) and ok
    if ref_finals:
        ok = run_corpus(tmpdir, ref_finals) and ok
        ok = run_training(tmpdir, _null_filtered(ref_finals)) and ok
        ok = run_quality(tmpdir, _null_filtered(ref_finals)) and ok
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
