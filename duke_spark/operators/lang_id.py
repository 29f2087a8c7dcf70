"""Production-grade language identification — pure Catalyst, no Python
in the hot path.

Two public signals, combined per row with the same greatest-of-structs
shape as ``text_analysis.language_id`` (the 4-language oracle-checkable
variant, which stays as the driver-contract query):

1. **Unicode-script detection** (``\\p{IsXxx}`` character classes,
   evaluated as JVM regex counts): scripts that identify a language
   outright (Greek, Hebrew, Thai, Hangul, kana, Han, Georgian, Armenian,
   Devanagari, Bengali, Tamil, Telugu, Myanmar, Khmer, Ethiopic) map
   directly; Han with any kana present is Japanese, without kana Chinese.
2. **Stopword + character-trigram voting** for the space-separated
   scripts (Latin, Cyrillic, Arabic): per language, the hit ratio of its
   function-word list over the document's words, blended with the hit
   ratio of its trigram profile over the document's padded character
   trigrams. The trigram profiles are DERIVED from the stopword lists
   (all length-3 substrings of " word "), which keeps the tables small,
   reproducible, and repairs the stopword signal when punctuation glues
   to words or text is fragmentary — the Cavnar–Trenkle n-gram idea
   applied to a closed public word list instead of a trained corpus.

Word lists are the standard public top-function-words for each language
(the same lists every stopword package ships). ~45 languages total.

Scale shape: every signal is computed on a bounded prefix
(``prefix_len`` chars, default 1200), so per-row cost is O(prefix), not
O(doc), and the whole operator is a single narrow projection — no
shuffle, no UDF, fully pushdown/codegen-friendly. At 100 TB this runs at
scan speed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# --- public per-language function-word lists (space-separated scripts) ----

STOPWORD_PROFILES: dict[str, list[str]] = {
    # Latin script
    "en": ["the", "of", "and", "to", "in", "is", "was", "that", "for",
           "it", "with", "as", "on", "be", "at", "by", "this", "have",
           "from", "are", "not", "but", "they", "his", "she"],
    "de": ["der", "die", "und", "das", "ist", "von", "den", "mit",
           "nicht", "ein", "eine", "auf", "für", "im", "dem", "des",
           "sich", "als", "auch", "wird", "bei", "oder", "aus", "zu",
           "war", "dass", "sie", "wir", "sind"],
    "fr": ["le", "la", "les", "et", "des", "est", "un", "une", "du",
           "dans", "que", "pour", "qui", "sur", "pas", "plus", "par",
           "avec", "son", "au", "il", "elle", "ne", "ce", "sont",
           "nous", "très"],
    "es": ["el", "la", "los", "las", "de", "que", "y", "en", "un",
           "una", "es", "por", "con", "para", "su", "se", "no", "del",
           "al", "como", "más", "pero", "sus", "fue", "muy", "está"],
    "pt": ["o", "os", "as", "de", "que", "e", "do", "da", "em", "um",
           "uma", "é", "com", "não", "por", "para", "se", "dos", "das",
           "mais", "foi", "como", "seu", "sua", "já", "ao"],
    "it": ["il", "di", "che", "e", "è", "un", "una", "per", "non",
           "con", "del", "della", "si", "da", "nel", "le", "gli",
           "dei", "al", "più", "anche", "come", "sono", "ha", "molto"],
    "nl": ["de", "het", "een", "en", "van", "is", "dat", "op", "te",
           "zijn", "voor", "met", "niet", "aan", "er", "om", "ook",
           "als", "bij", "maar", "uit", "naar", "door", "over", "dan",
           "we", "wij", "heb", "gelezen"],
    "sv": ["och", "att", "det", "som", "en", "på", "är", "av", "för",
           "med", "den", "till", "inte", "har", "de", "om", "ett",
           "han", "men", "var", "sig", "från", "vi", "så", "kan",
           "här", "läst"],
    "da": ["og", "at", "det", "en", "den", "til", "er", "som", "på",
           "de", "med", "han", "af", "for", "ikke", "der", "var",
           "sig", "men", "et", "har", "om", "vi", "hvad", "efter",
           "ud", "op", "hvor", "hende", "vidste", "i", "jeg",
           "meget", "dag"],
    "no": ["og", "i", "det", "på", "som", "er", "en", "til", "å",
           "han", "av", "for", "med", "at", "var", "de", "ikke",
           "den", "har", "jeg", "om", "et", "men", "så", "hva",
           "etter", "ut", "opp", "henne", "visste", "veldig", "vi",
           "dag"],
    "fi": ["ja", "on", "ei", "että", "oli", "hän", "se", "mutta",
           "ovat", "kun", "niin", "myös", "joka", "sen", "hänen",
           "mukaan", "ole", "jo", "kuin", "sekä", "tai", "vain",
           "tämä", "olen", "me", "hänelle"],
    "pl": ["i", "w", "nie", "na", "się", "z", "do", "że", "jest",
           "to", "jak", "po", "co", "tak", "za", "od", "przez", "ale",
           "są", "która", "który", "oraz", "jego", "był", "dla",
           "było", "które"],
    "cs": ["a", "se", "na", "je", "v", "že", "s", "z", "do", "to",
           "jako", "za", "by", "po", "ale", "si", "pro", "tak",
           "jsou", "který", "jeho", "byl", "od", "nebo", "při",
           "jsme", "jsem", "které", "bylo"],
    "sk": ["a", "sa", "na", "je", "v", "že", "s", "z", "do", "to",
           "ako", "za", "by", "po", "ale", "si", "pre", "tak", "sú",
           "ktorý", "jeho", "bol", "od", "alebo", "pri", "sme",
           "som", "ktoré", "bolo"],
    "ro": ["și", "de", "la", "a", "în", "este", "cu", "pe", "care",
           "nu", "o", "un", "pentru", "din", "mai", "se", "sau",
           "sunt", "ca", "au", "fost", "lui", "dar", "când", "după",
           "era", "cele"],
    "hu": ["a", "az", "és", "hogy", "nem", "is", "egy", "van", "volt",
           "de", "meg", "ez", "el", "már", "csak", "mint", "még",
           "ki", "be", "sem", "vagy", "ha", "így", "majd", "pedig",
           "ma", "amit"],
    "tr": ["bir", "ve", "bu", "da", "de", "için", "ile", "olarak",
           "çok", "daha", "ama", "gibi", "en", "kadar", "sonra",
           "olan", "her", "ne", "var", "değil", "ben", "o", "diye",
           "ki", "ya"],
    "id": ["yang", "dan", "di", "itu", "dengan", "untuk", "tidak",
           "ini", "dari", "dalam", "akan", "pada", "juga", "saya",
           "ke", "karena", "tersebut", "bisa", "ada", "mereka",
           "sudah", "atau", "seperti", "oleh", "kita", "adalah"],
    "vi": ["và", "của", "là", "có", "không", "được", "trong", "đã",
           "người", "những", "một", "cho", "với", "các", "này", "để",
           "khi", "cũng", "ra", "về", "như", "đến", "từ", "thì",
           "tại", "rất"],
    "ca": ["el", "la", "els", "les", "i", "de", "que", "a", "en",
           "un", "una", "és", "per", "amb", "del", "no", "es", "al",
           "més", "com", "són", "dels", "ha", "ho", "si", "molt",
           "vam", "avui"],
    "hr": ["i", "je", "u", "se", "na", "da", "su", "za", "od", "s",
           "a", "koji", "što", "ali", "ili", "bi", "kao", "do", "će",
           "iz", "po", "nije", "samo", "o", "još", "smo", "sam",
           "bilo"],
    "sl": ["in", "je", "se", "na", "da", "za", "so", "v", "z", "ki",
           "kot", "pa", "po", "ne", "bi", "tudi", "do", "iz", "ob",
           "še", "le", "bil", "bila", "ali", "pri", "to", "sem",
           "smo", "ni"],
    "et": ["ja", "on", "ei", "et", "kui", "oli", "ka", "see", "ta",
           "oma", "ning", "mis", "aga", "või", "siis", "nagu", "üle",
           "veel", "juba", "kes", "pole", "välja", "kus", "nii",
           "seda", "me", "ma", "olen", "mida", "väga"],
    "lt": ["ir", "yra", "kad", "į", "su", "tai", "bet", "iš", "kaip",
           "buvo", "jis", "ji", "bei", "per", "apie", "dar", "jau",
           "tik", "po", "nes", "arba", "nuo", "prie", "taip", "savo",
           "mes", "labai", "esu", "viena", "kurios", "kurias"],
    "lv": ["un", "ir", "ka", "es", "par", "ar", "kā", "uz", "no",
           "bet", "tas", "viņš", "arī", "tik", "jau", "vai", "pēc",
           "tikai", "vēl", "šo", "savu", "kas", "to", "pie", "lai",
           "mēs", "bija", "viena"],
    # Cyrillic script
    "ru": ["и", "в", "не", "на", "что", "он", "с", "как", "это",
           "по", "но", "его", "из", "у", "за", "от", "то", "же",
           "был", "так", "о", "все", "она", "к", "а", "для",
           "которые", "была", "очень"],
    "uk": ["і", "в", "не", "на", "що", "він", "з", "як", "це", "по",
           "але", "його", "із", "у", "за", "від", "то", "ж", "був",
           "так", "про", "все", "вона", "до", "та", "ми", "дуже",
           "які", "була"],
    "bg": ["и", "в", "не", "на", "че", "той", "с", "как", "това",
           "по", "но", "да", "се", "от", "за", "е", "са", "беше",
           "така", "или", "към", "при", "които", "като", "тя",
           "една", "много"],
    "sr": ["и", "је", "у", "се", "на", "да", "су", "за", "од", "с",
           "а", "који", "што", "али", "или", "би", "као", "до", "ће",
           "из", "по", "није", "само", "о", "још", "смо", "сам",
           "било", "веома"],
    # Arabic script
    "ar": ["في", "من", "على", "أن", "إلى", "عن", "مع", "هذا", "التي",
           "الذي", "كان", "لم", "ما", "لا", "هو", "هي", "أو", "ثم",
           "قد", "كل", "هذه", "جدا"],
    "fa": ["در", "از", "به", "که", "این", "را", "با", "است", "برای",
           "آن", "یک", "خود", "تا", "بر", "هم", "نیز", "شده", "بود",
           "می", "های", "ما", "او"],
    "ur": ["کے", "میں", "کی", "کا", "ہے", "سے", "کو", "پر", "اور",
           "نے", "یہ", "ہیں", "تھا", "گیا", "ان", "ایک", "نہیں",
           "بہت", "جو", "ہم"],
}

# script-identified languages: lang -> Java regex character class
SCRIPT_LANGS: dict[str, str] = {
    "el": r"\p{IsGreek}",
    "he": r"\p{IsHebrew}",
    "th": r"\p{IsThai}",
    "ka": r"\p{IsGeorgian}",
    "hy": r"\p{IsArmenian}",
    "hi": r"\p{IsDevanagari}",
    "bn": r"\p{IsBengali}",
    "ta": r"\p{IsTamil}",
    "te": r"\p{IsTelugu}",
    "ko": r"\p{IsHangul}",
    "my": r"\p{IsMyanmar}",
    "km": r"\p{IsKhmer}",
    "am": r"\p{IsEthiopic}",
    # zh / ja are special-cased on Han + kana below
}

_KANA = r"[\p{IsHiragana}\p{IsKatakana}]"
_HAN = r"\p{IsHan}"

STOP_WEIGHT = 0.7          # blend of word-hit vs trigram-hit ratios
GRAM_WEIGHT = 0.3
DEFAULT_PREFIX = 1200      # chars the word/script signals are computed on
DEFAULT_GRAM_PREFIX = 400  # chars the trigram signal is computed on —
#                            building the per-row trigram array (one
#                            substr + hash per position) is the single
#                            most expensive term, and trigram coverage
#                            saturates within a few hundred chars
DEFAULT_SCRIPT_PREFIX = 300  # chars the ~22 per-script regex counts run
#                              on — script identity saturates immediately,
#                              and these regexes are the second-largest
#                              per-row term after the gram build


def trigram_profile(words: list[str]) -> list[str]:
    """All length-3 substrings of ``" word "`` over the list, deduped and
    sorted — the language's characteristic-trigram set."""
    grams = set()
    for w in words:
        padded = f" {w} "
        grams.update(padded[i:i + 3] for i in range(len(padded) - 2))
    return sorted(grams)


TRIGRAM_PROFILES: dict[str, list[str]] = {
    lang: trigram_profile(ws) for lang, ws in STOPWORD_PROFILES.items()
}


def _script_count(prefix, cls: str):
    return F.length(F.regexp_replace(prefix, f"[^{cls}]", ""))


# the script family each worded language belongs to — used to
# short-circuit its (relatively costly) word/gram matching when the
# document contains no characters of that script at all
_WORDED_FAMILY = {
    **{l: "latin" for l in
       ("en de fr es pt it nl sv da no fi pl cs sk ro hu tr id vi ca "
        "hr sl et lt lv").split()},
    **{l: "cyrillic" for l in ("ru", "uk", "bg", "sr")},
    **{l: "arabic" for l in ("ar", "fa", "ur")},
}
_FAMILY_CLS = {"latin": r"\p{IsLatin}", "cyrillic": r"\p{IsCyrillic}",
               "arabic": r"\p{IsArabic}"}


def detect_language(df: DataFrame, text_col: str = "text",
                    prefix_len: int = DEFAULT_PREFIX,
                    gram_prefix_len: int = DEFAULT_GRAM_PREFIX,
                    min_score: float = 0.0) -> DataFrame:
    """Add ``lang_pred`` (ISO-639-1) and ``lang_score`` columns.

    ~45 languages: script-identified ones score by their script's share
    of the prefix's letters; space-separated ones by the stopword/trigram
    blend. One ``greatest`` over all the per-language structs picks the
    winner; ``und`` when nothing scores above ``min_score`` (letters-free
    rows, unknown languages).

    Cost engineering (all per-row, no shuffle, no Python):
    * the trigram array is built on ``gram_prefix_len`` chars only and
      deduped once; per-language matching is ``array_intersect``
      (hash-set, O(n+m)) — an ``isin`` over the profile inside a lambda
      skips Catalyst's InSet rewrite and measured ~100× slower;
    * each worded language's matching is wrapped in a script-presence
      CASE (CaseWhen short-circuits at runtime), so a Latin document
      never evaluates the Cyrillic/Arabic word lists and vice versa;
    * the shared per-row state (word array, trigram array, script
      counts) is LET-BOUND inside a single-element ``transform`` lambda.
      Leaving it as plain projected columns lets alias substitution
      (filter pushdown, CollapseProject) inline the array-build
      expression into every one of the ~100 consuming sites — measured
      ~1.7 s/row inside ``clean_corpus`` vs <1 ms here. A lambda
      variable cannot be inlined into, so the environment is built once
      per copy of the whole expression (the two output columns + a
      pushed filter ⇒ ≤3 copies, not 100)."""
    raw = F.substring(F.col(text_col), 1, prefix_len)
    sraw = F.substring(F.col(text_col), 1, DEFAULT_SCRIPT_PREFIX)
    letters = F.greatest(
        F.length(F.regexp_replace(sraw, r"[^\p{L}]", "")), F.lit(1))
    lowered = F.lower(raw)
    clean = F.trim(F.regexp_replace(
        F.regexp_replace(lowered, r"[^\p{L}']+", " "), r" +", " "))
    words = F.split(clean, " ")
    padded = F.concat(
        F.lit(" "), F.substring(clean, 1, gram_prefix_len), F.lit(" "))

    # padded is LET-BOUND before the per-position lambda: a lambda body
    # that references a non-lambda-variable subexpression re-evaluates it
    # PER ARRAY ELEMENT in Spark's eval paths (confirmed by jstack: the
    # trim/regex chain was the hot frame inside the substr loop — ~400
    # re-evaluations of two regex passes per row). Binding it through a
    # one-element transform makes the inner lambda see a lambda variable,
    # which is evaluated exactly once.
    def grams_of(p):
        n_grams = F.length(p) - F.lit(2)
        return F.when(
            n_grams >= 1,
            F.transform(F.sequence(F.lit(1), F.greatest(n_grams, F.lit(1))),
                        lambda i: p.substr(i, F.lit(3)))
        ).otherwise(F.array().cast("array<string>"))

    grams = F.transform(F.array(padded), grams_of)[0]

    # the let-bound environment: everything downstream references only
    # the lambda variable `s`, so each field is evaluated exactly once.
    # Cost engineering for the env itself: Java's \p{IsXxx} predicates do
    # a per-char Unicode-script binary search (jstack-confirmed hot), so
    # (a) the three family GATES are early-exit `rlike` presence tests,
    # not counts, and (b) the 17 script-language counts are CASE-gated
    # behind one cheap non-ASCII pre-test — a pure-ASCII prefix (the
    # common case in web corpora) short-circuits past every
    # Unicode-script regex.
    non_ascii = sraw.rlike(r"[^\x00-\xff]")
    env_fields = [words.alias("w"), F.array_distinct(grams).alias("g"),
                  letters.cast("double").alias("lt")]
    for fam, cls in _FAMILY_CLS.items():
        env_fields.append(sraw.rlike(f"[{cls}]").alias(f"f_{fam}"))

    def gated_count(cls):
        return (F.when(non_ascii, _script_count(sraw, cls))
                .otherwise(F.lit(0)))

    for lang, cls in SCRIPT_LANGS.items():
        env_fields.append(gated_count(cls).alias(f"s_{lang}"))
    env_fields.append(gated_count(_KANA).alias("kana"))
    env_fields.append(gated_count(_HAN).alias("han"))
    env = F.struct(*env_fields)

    def vote(s):
        n_words = F.greatest(F.size(s["w"]), F.lit(1)).cast("double")
        n_g = F.greatest(F.size(s["g"]), F.lit(1)).cast("double")
        structs = []
        for lang in sorted(STOPWORD_PROFILES):
            sw = STOPWORD_PROFILES[lang]
            prof = TRIGRAM_PROFILES[lang]
            stop_ratio = (F.size(F.filter(s["w"],
                                          lambda x: x.isin(*sw))) / n_words)
            gram_ratio = F.size(F.array_intersect(
                s["g"], F.array(*[F.lit(g) for g in prof]))) / n_g
            score = (F.lit(STOP_WEIGHT) * stop_ratio +
                     F.lit(GRAM_WEIGHT) * gram_ratio)
            gated = (F.when(s[f"f_{_WORDED_FAMILY[lang]}"], score)
                     .otherwise(F.lit(0.0)))
            structs.append(F.struct(gated.alias("score"),
                                    F.lit(lang).alias("lang")))
        for lang in sorted(SCRIPT_LANGS):
            frac = s[f"s_{lang}"].cast("double") / s["lt"]
            structs.append(F.struct(frac.alias("score"),
                                    F.lit(lang).alias("lang")))
        # Han/kana: any kana → Japanese (counting Han toward it); Han
        # with no kana → Chinese
        kana, han = s["kana"].cast("double"), s["han"].cast("double")
        structs.append(F.struct(
            (F.when(kana > 0, kana + han).otherwise(F.lit(0.0))
             / s["lt"]).alias("score"),
            F.lit("ja").alias("lang")))
        structs.append(F.struct(
            (F.when(kana > 0, F.lit(0.0)).otherwise(han)
             / s["lt"]).alias("score"),
            F.lit("zh").alias("lang")))
        best = F.greatest(*structs)
        return F.struct(
            F.when(best["score"] > min_score, best["lang"])
            .otherwise(F.lit("und")).alias("pred"),
            F.round(best["score"], 6).alias("score"))

    # F.shuffle of the 1-element array is a value-level identity but marks
    # the expression NON-DETERMINISTIC, which (a) stops CollapseProject
    # from inlining the whole vote into every consumer and (b) stops
    # filter pushdown from moving a `lang_pred` predicate into a Filter
    # node — predicate-context evaluation of this expression measured
    # ~20× slower per row than projection-context (and the inline path
    # measured ~100 copies). With the guard, downstream filters see a
    # plain attribute and the vote runs exactly once per row.
    bound = F.shuffle(F.transform(F.array(env), vote))[0]
    return (df.withColumn("_lid", bound)
            .withColumn("lang_pred", F.col("_lid.pred"))
            .withColumn("lang_score", F.col("_lid.score"))
            .drop("_lid"))
