package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** Minimal JSON-Schema validator (the subset GE's golden tests exercise:
  * type / properties / required / items / enum / minimum / maximum /
  * minLength / maxLength). The reference runs Python `jsonschema` in a UDF
  * (column_values_match_json_schema.py:42-60); this is the pure-JVM
  * equivalent on Spark's bundled Jackson. */
object JsonSchema {

  private lazy val mapper = {
    val m = new ObjectMapper()
    // strict: '{"k":1}}' must be invalid (matches DuckDB json_valid /
    // Python json.loads); Jackson's readTree is lenient about trailing
    // tokens by default.
    m.enable(com.fasterxml.jackson.databind.DeserializationFeature.FAIL_ON_TRAILING_TOKENS)
    m
  }

  def validates(json: String, schema: String): Boolean =
    try {
      val node = mapper.readTree(json)
      val sch = mapper.readTree(schema)
      validate(node, sch)
    } catch { case _: Exception => false }

  def parseable(json: String): Boolean =
    try { mapper.readTree(json); true } catch { case _: Exception => false }

  private def validate(n: JsonNode, s: JsonNode): Boolean = {
    if (s.has("type")) {
      val ok = s.get("type").asText() match {
        case "object" => n.isObject
        case "array" => n.isArray
        case "string" => n.isTextual
        case "integer" => n.isIntegralNumber
        case "number" => n.isNumber
        case "boolean" => n.isBoolean
        case "null" => n.isNull
        case _ => true
      }
      if (!ok) return false
    }
    // per JSON Schema (and Python jsonschema): `required` constrains only
    // OBJECT instances — non-objects pass it vacuously
    if (s.has("required") && n.isObject) {
      val it = s.get("required").elements()
      while (it.hasNext) if (!n.has(it.next().asText())) return false
    }
    if (s.has("properties") && n.isObject) {
      val it = s.get("properties").fields()
      while (it.hasNext) {
        val e = it.next()
        if (n.has(e.getKey) && !validate(n.get(e.getKey), e.getValue)) return false
      }
    }
    if (s.has("items") && n.isArray) {
      val it = n.elements()
      while (it.hasNext) if (!validate(it.next(), s.get("items"))) return false
    }
    if (s.has("enum")) {
      val it = s.get("enum").elements()
      var found = false
      while (it.hasNext && !found) found = it.next() == n
      if (!found) return false
    }
    if (s.has("minimum") && n.isNumber &&
      n.doubleValue() < s.get("minimum").doubleValue()) return false
    if (s.has("maximum") && n.isNumber &&
      n.doubleValue() > s.get("maximum").doubleValue()) return false
    if (s.has("minLength") && n.isTextual &&
      n.asText().length < s.get("minLength").intValue()) return false
    if (s.has("maxLength") && n.isTextual &&
      n.asText().length > s.get("maxLength").intValue()) return false
    true
  }
}
