from instructions_mr_spark.operators.scope import (  # noqa: F401
    scope_project,
    stringify_kv,
    json_serialize,
    any_to_str,
    json_clean,
)
from instructions_mr_spark.operators.prompts import (  # noqa: F401
    build_sys_msg,
    user_msg_col,
    chatml_col,
    prompt_template_sub,
    xml_tag_wrap,
)
