"""AI-assisted SQL — ``generate_sql`` / ``ask`` (reference
agent/skills/chdb-sql/references/api-reference.md:228-260).

The reference gates these behind an LLM API key in the environment; this
build keeps the same contract: with no key configured the calls raise a
clear error, and when a key IS present the prompt assembly + result
plumbing here is real — the LLM client import happens lazily so the
module works in offline containers.

The generated SQL runs through the ClickHouse-dialect layer like any
other query, so LLM output written in CH dialect (which is what a model
prompted with "ClickHouse SQL" produces) executes unmodified.
"""

from __future__ import annotations

import os

_KEY_VARS = ("ANTHROPIC_API_KEY", "OPENAI_API_KEY", "LLM_API_KEY")

_SQL_PROMPT = (
    "Generate one ClickHouse SQL query for the request below. The data is "
    "reachable with table functions like file('path', Parquet). Reply with "
    "ONLY the SQL, no prose.\n\nRequest: {question}\n"
)


def _api_key() -> tuple[str, str] | None:
    for var in _KEY_VARS:
        val = os.environ.get(var)
        if val:
            return var, val
    return None


def _complete(prompt: str) -> str:
    """One LLM completion using whichever SDK matches the configured key."""
    key = _api_key()
    if key is None:
        raise RuntimeError(
            "AI-assisted SQL requires an LLM API key in the environment "
            f"(one of {', '.join(_KEY_VARS)}) — reference api-reference.md:260"
        )
    var, val = key
    if var == "ANTHROPIC_API_KEY":
        import anthropic  # lazy: not installed in offline containers

        client = anthropic.Anthropic(api_key=val)
        msg = client.messages.create(
            model=os.environ.get("LLM_MODEL", "claude-sonnet-4-5"),
            max_tokens=1024,
            messages=[{"role": "user", "content": prompt}],
        )
        return msg.content[0].text
    import openai

    client = openai.OpenAI(api_key=val)
    out = client.chat.completions.create(
        model=os.environ.get("LLM_MODEL", "gpt-4o-mini"),
        messages=[{"role": "user", "content": prompt}],
    )
    return out.choices[0].message.content


def _strip_fences(text: str) -> str:
    t = text.strip()
    if t.startswith("```"):
        t = t.split("\n", 1)[1] if "\n" in t else t[3:]
        if t.rstrip().endswith("```"):
            t = t.rstrip()[:-3]
    return t.strip()


def generate_sql(question: str) -> str:
    """Natural language → ClickHouse SQL text (reference ``chdb.generate_sql``).
    Requires an LLM API key in the environment."""
    return _strip_fences(_complete(_SQL_PROMPT.format(question=question)))


def ask(question: str, data: str | None = None, spark=None):
    """Question → SQL → executed result (reference ``chdb.ask``)."""
    from chdb_spark import session as chs
    from chdb_spark.session import get_spark

    q = question if data is None else f"{question} (data file: {data})"
    sql_text = generate_sql(q)
    return chs.query(spark or get_spark(), sql_text, "Pandas")
